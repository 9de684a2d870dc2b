"""Full-text relevance search over the documents table: BM25 top-k.

Scale-extension operator (no reference counterpart — the reference is a
graph-frame library).  Design rules match the rest of ``functions/``:
pure JVM column expressions, uniform-keyed shuffles, float determinism
via per-term rounding + exact DECIMAL summation so the DuckDB oracle
hash-matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col


def bm25_top_docs(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25:

        score(d) = sum_t  idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))        (Robertson/Lucene)

    Returns ``(id_col, score, rank)``, rank 1..k ordered by
    (score desc, id asc).

    Plan: one explode filtered to the query's terms (the filter prunes
    the exploded stream before any shuffle, so cost is ~one scan +
    |matching postings|), per-(doc,term) hash-agg for tf, a tiny
    per-term document-frequency aggregate that AQE broadcasts back, one
    per-doc sum, then a distributed top-k: ``orderBy(...).limit(k)``
    (Spark's TakeOrdered — per-partition heaps, never a global
    single-partition sort) followed by a rank window over only the k
    surviving rows.  A query containing a corpus-common term therefore
    never funnels the whole match set through one task.

    Determinism: per-term scores are rounded to 6 dp, summed through
    DECIMAL(38,12) (exact, order-independent), and the total rounded to
    6 dp — bit-reproducible at any parallelism and engine-portable
    (``avgdl`` is an exact-integer-sum / count double division).
    """
    terms = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("t")
    )
    lens = toks.select("id", F.size("t").alias("dl"))
    tot = lens.agg(
        F.sum("dl").alias("sdl"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    n_docs = tot["n"]
    if n_docs == 0:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, score double, rank int"
        )
    avgdl = tot["sdl"] / n_docs
    tf = (
        toks.select("id", F.explode("t").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    per_term = (
        tf.join(F.broadcast(dfreq), on="term")
        .join(lens, on="id")
        .select(
            "id",
            F.round(
                idf
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
                ),
                6,
            )
            .cast("decimal(38,12)")
            .alias("ts"),
        )
    )
    scored = per_term.groupBy("id").agg(
        F.round(F.sum("ts").cast("double"), 6).alias("score")
    )
    top = scored.orderBy(F.desc("score"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("id"))  # k rows only
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(F.col("id").alias(id_col), "score", "rank")
    )


def rrf_fuse(
    ranked: Sequence[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    query_col: str | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked
    retrieval lists: ``rrf = sum_i 1 / (k + rank_i)`` over the lists
    an id appears in — the standard zero-tuning way to combine
    lexical (BM25) and vector (cosine top-k) rankings.  Returns
    ``(id_col, n_lists, rrf_score)``, score at 6 dp, ordered by
    nothing (callers sort).

    ``query_col``: when the rankings are PER-QUERY (a retrieval run
    over many queries, ranks starting at 1 within each query), name
    the query column — fusion then groups by (query, id) and adds a
    ``fused_rank`` (score desc, id asc tie-break) per query;
    ``top_k`` truncates each query's fused list.

    Determinism: each reciprocal term is rounded to 12 dp and summed
    as DECIMAL(38,12) — order-independent regardless of how the
    union's partitions merge; the fused order ties on the exact
    decimal score are broken by id.

    Scale design: a union + ONE hash aggregate on the (query, id)
    key; list count N is a small constant, so the union is linear in
    total ranked rows.  The only window is query-keyed (never
    global); without ``query_col`` there is no window at all.
    """
    if not ranked:
        raise ValueError("rrf_fuse: no ranked lists given")
    keys = ([query_col] if query_col else []) + [id_col]
    parts = [
        df.select(
            *[F.col(c) for c in keys],
            F.round(
                F.lit(1.0) / (F.lit(k) + F.col(rank_col)), 12
            ).cast("decimal(38,12)").alias("__term"),
        )
        for df in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    fused = u.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.round(F.sum("__term").cast("double"), 6).alias("rrf_score"),
    )
    if query_col is None:
        return fused
    w = Window.partitionBy(query_col).orderBy(
        F.desc("rrf_score"), F.asc(id_col)
    )
    fused = fused.withColumn("fused_rank", F.row_number().over(w))
    if top_k is not None:
        fused = fused.filter(F.col("fused_rank") <= top_k)
    return fused
