"""Distributed quality-classifier training: a hard-sigmoid logistic
model over cheap codegen'd text features, trained by full-batch
gradient descent where EVERY quantity is an exact scaled integer —
so training is bit-identical across engines, partitionings, and
re-runs (the fastText-quality-classifier slot of a corpus pipeline:
the "quality weight" stage of GPT-3/PaLM-style data curation).

Scale-extension operator (no reference counterpart).

Design for 100 TB:

- Per-iteration cost is ONE map-side-combinable aggregate over the
  fact table (the gradient vector), with the current weights riding
  into the tasks as literals — no shuffle beyond the aggregate's
  1-row combine, no Python boundary, no per-row UDF.
- The weight vector is a manifest (``N_FEATURES`` numbers) collected
  per round — driver-sized by construction, the same contract as
  :func:`~networkframe_spark.functions.similarity.ivf_fit_centroids`'
  centroid table or ``bpe_train``'s merge picks.
- Determinism: features are scaled-integer ratios (units of 1e-6)
  built from truncating integer division (SQL ``div``); the model's
  activation is the HARD sigmoid ``clamp(0.5 + z/4, 0, 1)`` — a
  piecewise-LINEAR logistic surrogate, so probabilities, residuals,
  gradients, and weight updates stay exact integers (units of 1e-9
  for weights/probabilities, 1e-15 for gradient terms summed as
  DECIMAL(38,0)).  Gradient sums are order-independent, so training
  cannot drift with partitioning — and a DuckDB oracle reproduces it
  bit-for-bit (HUGEINT ``//`` and Spark ``div`` both truncate toward
  zero; verified on both engines).
- exp()-based logistic regression would put an engine-specific
  last-ulp into every sigmoid; the hard sigmoid trades a slightly
  different surrogate loss for exact portability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# feature values are integers in units of 1e-6 (ratios live in [0, 1e6])
FEATURE_UNIT = 10**6
# weights and probabilities are integers in units of 1e-9
WEIGHT_UNIT = 10**9

N_FEATURES = 6

_DEC = "DECIMAL(38,0)"


def _tdiv_int(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — the shared
    semantics of Spark SQL ``div`` and DuckDB HUGEINT ``//``;
    Python's ``//`` floors, so negative numerators need the
    sign-adjusted form."""
    q = abs(a) // b
    return q if a >= 0 else -q


def feature_sql_exprs(text_col: str = "text") -> list[str]:
    """The fixed feature map as Spark-SQL expression strings: six
    scaled-integer columns ``x0..x5`` (units 1e-6), each a single
    length/regexp expression — codegen'd, map-side, no shuffle.

    x0 bias=1; x1 length saturation (words/200, capped); x2 non-
    alphanumeric char ratio; x3 ascii-letter ratio; x4 mean-word-
    length saturation (/20, capped); x5 space ratio.  Numerators are
    all nonnegative, so plain ``div`` is exact truncating division.
    """
    t = text_col
    u = FEATURE_UNIT
    n_chars = f"GREATEST(length({t}), 1)"
    n_words = f"GREATEST(size(split(trim({t}), '\\\\s+')), 1)"
    return [
        f"CAST({u} AS BIGINT) AS x0",
        f"(LEAST({n_words}, 200) * {u}) div 200 AS x1",
        f"(length(regexp_replace(lower({t}), '[a-z0-9\\\\s]', '')) * {u})"
        f" div {n_chars} AS x2",
        f"(length(regexp_replace(lower({t}), '[^a-z]', '')) * {u})"
        f" div {n_chars} AS x3",
        f"(LEAST(length({t}) div {n_words}, 20) * {u}) div 20 AS x4",
        f"(length(regexp_replace({t}, '[^ ]', '')) * {u})"
        f" div {n_chars} AS x5",
    ]


def _p_sql(weights: list[int]) -> str:
    """Hard-sigmoid probability in 1e-9 units as a SQL expression over
    feature columns ``x0..x5``: ``clamp(5e8 + z div (4 * 1e6), 0,
    1e9)`` with ``z = sum_j w_j x_j`` exact in DECIMAL(38,0) and a
    sign-adjusted truncating div (z can be negative)."""
    z = " + ".join(
        f"CAST({int(w)} AS {_DEC}) * CAST(x{j} AS {_DEC})"
        for j, w in enumerate(weights)
    )
    den = 4 * FEATURE_UNIT
    q = (
        f"CAST(CASE WHEN ({z}) >= 0 THEN ({z}) div {den}"
        f" ELSE -((-({z})) div {den}) END AS {_DEC})"
    )
    return (
        f"LEAST(GREATEST(CAST({5 * 10**8} AS {_DEC}) + {q},"
        f" CAST(0 AS {_DEC})), CAST({WEIGHT_UNIT} AS {_DEC}))"
    )


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_iter: int = 4,
    lr_num: int = 4,
    lr_den: int = 1,
) -> DataFrame:
    """Train the hard-sigmoid quality classifier; returns ONE row
    ``(n, accuracy, mean_p, w0..w5)``.

    ``label_col`` must be 0/1 (rows with NULL labels are dropped).
    ``lr = lr_num / lr_den`` as an exact rational.  Per iteration
    (all quantities exact integers)::

        p_i  = clamp(5e8 + (sum_j w_j x_ij) div 4e6, 0, 1e9)
        g_j  = sum_i (p_i - y_i * 1e9) * x_ij          -- DECIMAL(38,0)
        w_j -= (lr_num * g_j) div (lr_den * n * 1e6)   -- trunc toward 0

    Each iteration is one aggregate job over the (checkpointed)
    feature projection; the collected gradient is ``N_FEATURES``
    numbers.  The final pass computes accuracy / mean probability
    under the trained weights and carries the weights out as literal
    columns, so the returned plan is a single aggregate.
    """
    feats = (
        df.filter(F.col(label_col).isNotNull())
        .selectExpr(
            f"CAST({label_col} AS BIGINT) AS y", *feature_sql_exprs(text_col)
        )
        .localCheckpoint(eager=False)
    )

    weights = [0] * N_FEATURES
    for _ in range(int(n_iter)):
        p = F.expr(_p_sql(weights))
        resid = p - F.col("y").cast(_DEC) * F.lit(WEIGHT_UNIT).cast(_DEC)
        aggs = [
            F.sum((resid * F.col(f"x{j}").cast(_DEC)).cast(_DEC)).alias(f"g{j}")
            for j in range(N_FEATURES)
        ]
        row = feats.agg(*aggs, F.count(F.lit(1)).alias("n")).collect()[0]
        n_rows = int(row["n"])
        if n_rows == 0:
            break
        for j in range(N_FEATURES):
            weights[j] -= _tdiv_int(
                lr_num * int(row[f"g{j}"]), lr_den * n_rows * FEATURE_UNIT
            )

    p = F.expr(_p_sql(weights))
    pred = F.when(p >= F.lit(5 * 10**8).cast(_DEC), F.lit(1)).otherwise(F.lit(0))
    return feats.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.when(pred.cast("bigint") == F.col("y"), F.lit(1)).otherwise(F.lit(0))
        ).alias("__correct"),
        F.sum(p).alias("__psum"),
    ).select(
        F.col("__n").cast("bigint").alias("n"),
        F.round(F.col("__correct") / F.col("__n"), 6).alias("accuracy"),
        F.round(
            F.col("__psum").cast("double")
            / (F.col("__n").cast("double") * float(WEIGHT_UNIT)),
            6,
        ).alias("mean_p"),
        *[
            F.lit(float(weights[j]) / WEIGHT_UNIT).alias(f"w{j}")
            for j in range(N_FEATURES)
        ],
    )


def score_quality_classifier(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    out_col: str = "quality_p",
) -> DataFrame:
    """Score rows with a trained weight vector: adds ``out_col`` =
    hard-sigmoid probability in [0, 1] (6 dp, exact half-up from the
    integer probability).  Pure map-side expressions — the scoring
    pass rides the scan at any corpus size."""
    if len(weights) != N_FEATURES:
        raise ValueError(f"expected {N_FEATURES} weights, got {len(weights)}")
    wi = [int(round(w * WEIGHT_UNIT)) for w in weights]
    scored = df.selectExpr("*", *feature_sql_exprs(text_col))
    p = F.expr(_p_sql(wi))
    return scored.withColumn(
        out_col,
        (p.cast("decimal(38,9)") / F.lit(WEIGHT_UNIT))
        .cast("decimal(19,9)")
        .cast("double"),
    ).drop(*[f"x{j}" for j in range(N_FEATURES)])


def classification_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Binary-classification evaluation: ONE row ``(n, tp, fp, fn, tn,
    accuracy, precision, recall, f1)`` from 0/1 ``label_col`` vs 0/1
    ``pred_col`` (rows with a NULL in either are dropped) — the
    counterpart every trained quality filter needs before it gates a
    corpus.  Counts are exact integers from a single conditional
    aggregate; the ratios are the only floats (6 dp), each NULL when
    its denominator is zero.

    Scale: one map-side-combinable aggregate over the fact table —
    no shuffle beyond the 1-row combine.
    """
    y = F.col(label_col).cast("bigint")
    p = F.col(pred_col).cast("bigint")
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    agg = (
        df.filter(y.isNotNull() & p.isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n"),
            cnt((y == 1) & (p == 1)).alias("tp"),
            cnt((y == 0) & (p == 1)).alias("fp"),
            cnt((y == 1) & (p == 0)).alias("fn"),
            cnt((y == 0) & (p == 0)).alias("tn"),
        )
    )
    prec_den = F.col("tp") + F.col("fp")
    rec_den = F.col("tp") + F.col("fn")
    f1_den = 2 * F.col("tp") + F.col("fp") + F.col("fn")
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        F.col("tn").cast("bigint").alias("tn"),
        F.round((F.col("tp") + F.col("tn")) / F.col("n"), 6).alias("accuracy"),
        F.when(
            prec_den > 0, F.round(F.col("tp") / prec_den, 6)
        ).alias("precision"),
        F.when(rec_den > 0, F.round(F.col("tp") / rec_den, 6)).alias("recall"),
        F.when(
            f1_den > 0, F.round(2 * F.col("tp") / f1_den, 6)
        ).alias("f1"),
    )


def calibration_bins(
    df: DataFrame,
    p_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probability column: per bin
    ``(bin, n, mean_p, pos_rate)`` where ``bin = floor(p * n_bins)``
    clamped to ``n_bins - 1`` — the standard "is the quality score
    calibrated?" check before thresholding a corpus on it.

    Determinism: probabilities are summed as DECIMAL(28,9) (exact,
    order-independent — a double sum would drift with partitioning),
    so ``mean_p`` is engine-portable; ``pos_rate`` is a ratio of
    exact integers.  Empty bins are absent (the output is the
    observed support).

    Scale: one hash aggregate on the bin key (≤ n_bins groups,
    map-side combinable).
    """
    if n_bins < 1:
        raise ValueError("calibration_bins: n_bins >= 1")
    p = F.col(p_col)
    y = F.col(label_col).cast("bigint")
    b = F.least(
        F.floor(p * n_bins).cast("int"), F.lit(int(n_bins) - 1)
    )
    return (
        df.filter(p.isNotNull() & y.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(p.cast("decimal(28,9)")).alias("__psum"),
            F.sum(y).alias("__pos"),
        )
        .select(
            "bin",
            F.col("n").cast("bigint").alias("n"),
            # the DECIMAL sum is exact; the division happens in double
            # (identical operands -> identical IEEE quotient in every
            # engine, unlike decimal division whose result scale is
            # engine-defined)
            F.round(F.col("__psum").cast("double") / F.col("n"), 6).alias(
                "mean_p"
            ),
            F.round(F.col("__pos") / F.col("n"), 6).alias("pos_rate"),
        )
    )
