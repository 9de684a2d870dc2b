"""Grouped distribution statistics over event/metric tables: exact and
approximate percentiles.

Scale-extension operators (no reference counterpart).  The exact path
is the oracle-checkable one; the approximate path is the 100 TB one —
same call shape, so pipelines can flip a flag when the group
cardinality makes exact sorting unreasonable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pct_alias(p: float) -> str:
    # 0.5 -> p50, 0.99 -> p99, 0.999 -> p99_9
    return "p" + f"{p * 100:g}".replace(".", "_")


def group_percentiles(
    df: DataFrame,
    value_col: str,
    by: str | Sequence[str],
    ps: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group percentiles of ``value_col``: one row per group with a
    ``pXX`` column per requested percentile (linear interpolation at
    rank ``p*(n-1)`` — the ANSI ``percentile_cont`` definition), each
    rounded to 6 dp, plus ``n_rows``.

    ``exact=True`` uses ``F.percentile`` — a full per-group sort,
    deterministic and oracle-exact; right while groups fit an executor
    (it is still one partial/final hash aggregate, not a window).
    ``exact=False`` switches to ``F.approx_percentile`` (KLL-sketch,
    mergeable, bounded memory per group) — the only sane choice when a
    single group holds billions of rows; results are
    rank-error-bounded by ``1/accuracy``, not exact, so the oracle
    contract only covers the exact path.
    """
    keys = [by] if isinstance(by, str) else list(by)
    v = F.col(value_col).cast("double")
    fn = F.percentile if exact else (
        lambda c, p: F.approx_percentile(c, p, accuracy)
    )
    aggs = [
        F.round(fn(v, F.lit(float(p))), 6).alias(_pct_alias(p)) for p in ps
    ]
    return df.groupBy(*keys).agg(
        *aggs, F.count(F.lit(1)).alias("n_rows")
    )


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    descending: bool = True,
    tie_col: str | None = None,
) -> DataFrame:
    """Group-wise top-k: the ``k`` rows with the largest (or smallest)
    ``order_col`` per ``group_col``, with a ``rank`` column (1-based).
    Ties are pinned by ``tie_col`` (ascending) so results are
    deterministic — required; pass the table's unique id.

    The generic primitive behind "top products per nation", "best
    chunks per document", "nearest centroids per vector" — expressed
    once so every caller gets the same single-shuffle plan.

    Scale design: ONE hash exchange on the group key + an in-partition
    sort for the rank window; k does not affect the shuffle (the
    filter prunes post-window).  Skewed groups are AQE-splittable on
    the exchange, and state per group is the sort buffer, not k.
    """
    if tie_col is None:
        raise ValueError(
            "top_k_per_group: tie_col is required for deterministic ranks"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    order = (
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    )
    w = Window.partitionBy(group_col).orderBy(order, F.col(tie_col).asc())
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
