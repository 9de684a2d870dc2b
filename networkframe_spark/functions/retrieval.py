"""Retrieval-pipeline evaluation: ranking-quality metrics
(precision/recall@k, MRR, nDCG) for judging a retriever against
labeled relevance — the feedback loop of every embedding/RAG data
pipeline.  (Rank FUSION lives in :mod:`.search` — ``rrf_fuse`` —
next to the BM25 retriever it usually combines with.)

Scale-extension operator (no reference counterpart): a pure
DataFrame composition — equi-joins, keyed windows, and hash
aggregates; no Python boundary, no global window, no driver-side
iteration.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def retrieval_metrics(
    pred: DataFrame,
    truth: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    gain_col: str | None = None,
) -> DataFrame:
    """Ranking-quality metrics per query: given predicted rankings
    ``(query, doc, rank)`` and relevance labels ``(query, doc[,
    gain])``, computes hits / precision / recall at ``k``, MRR@k, and
    nDCG@k (binary gains unless ``gain_col`` names graded ones).
    Returns one row per predicted query ``(query_id, n_rel, hits,
    precision_at_k, recall_at_k, mrr, dcg, idcg, ndcg)``; queries
    with no relevant docs get NULL recall/ndcg.

    Conventions: ``DCG = sum gain / log2(rank + 1)`` over relevant
    docs ranked <= k; IDCG places the top-``min(n_rel, k)`` gains
    (desc, ties by doc id) at ranks 1..; MRR is the reciprocal of the
    FIRST relevant rank within the top k (0 when none).  All floats
    round to 6 dp.

    Scale design: one broadcast-free equi-join of the top-k
    predictions against the truth table on (query, doc), then
    query-keyed hash aggregates; IDCG comes from a query-keyed window
    over the truth table.  Nothing is query-count-quadratic and no
    window is unkeyed.
    """
    if k < 1:
        raise ValueError(f"retrieval_metrics: k must be >= 1, got {k}")
    g = (
        F.col(gain_col).cast("double")
        if gain_col
        else F.lit(1.0)
    )
    t = truth.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        g.alias("__gain"),
    )
    p = pred.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(rank_col).cast("bigint").alias("__rank"),
    )
    hits = p.join(t, on=["query_id", "doc_id"]).select(
        "query_id",
        "__rank",
        (F.col("__gain") / F.log2(F.col("__rank") + 1)).alias("__dcg_term"),
    )
    per_q_hits = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("hits"),
        F.min("__rank").alias("__first"),
        F.sum("__dcg_term").alias("__dcg"),
    )
    tw = Window.partitionBy("query_id").orderBy(
        F.desc("__gain"), F.asc("doc_id")
    )
    ideal = (
        t.withColumn("__irank", F.row_number().over(tw))
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_rel"),
            F.sum(
                F.when(
                    F.col("__irank") <= k,
                    F.col("__gain") / F.log2(F.col("__irank") + 1),
                )
            ).alias("__idcg"),
        )
    )
    queries = pred.select(
        F.col(query_col).alias("query_id")
    ).distinct()
    joined = queries.join(per_q_hits, on="query_id", how="left").join(
        ideal, on="query_id", how="left"
    )
    hits_n = F.coalesce(F.col("hits"), F.lit(0))
    dcg = F.coalesce(F.col("__dcg"), F.lit(0.0))
    return joined.select(
        "query_id",
        F.coalesce(F.col("n_rel"), F.lit(0)).cast("bigint").alias("n_rel"),
        hits_n.cast("bigint").alias("hits"),
        F.round(hits_n / F.lit(float(k)), 6).alias("precision_at_k"),
        F.round(
            F.when(F.col("n_rel") > 0, hits_n / F.col("n_rel")), 6
        ).alias("recall_at_k"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("__first"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round(dcg, 6).alias("dcg"),
        F.round(F.col("__idcg"), 6).alias("idcg"),
        F.round(
            F.when(F.col("__idcg") > 0, dcg / F.col("__idcg")), 6
        ).alias("ndcg"),
    )
