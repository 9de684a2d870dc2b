"""Capture the r17 before/after SUBPLAN evidence.

The r17 changes live inside iterative operators whose per-round state
is checkpointed, so the final-query plans (and all 28 committed
fingerprints) are unchanged — the plan evidence must be the round-body
subplans, exactly as r16 did for its checkpoint/cache probes.  This
script dumps the AFTER side from the current tree:

- ``louvain_move_round_after``   — one phase round's move/next-state
  plan (window-derived __ka, single kvc exchange)
- ``louvain_accept_q_after``     — the merged 4-leg accept collect
  (singleton Q + candidate Q in ONE query)
- ``hits_half_after``            — one HITS half-round (ROLLUP folds
  the L1 normalizer into the score aggregate)
- ``neardup_fold_pairs_after``   — the pairs-state materialization of
  one fold with materialize=True (reads the docs/bands checkpoints)

The BEFORE side is captured from a worktree checked out at the
pre-r17 commit with the sibling script (see plans/r17/README or
OPTIMIZATION_r17.md); both write into plans/r17/ of the MAIN repo via
$PLANS_REPO.

Usage: python tools/capture_r17_plans.py [suffix]   (default "after")
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from networkframe_spark import NetworkFrame
from networkframe_spark.algorithms import _cut_lineage, _edge_pairs
from networkframe_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(os.environ.get("PLANS_REPO", REPO), "plans", "r17")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "after"


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def dump(name: str, df) -> None:
    plan = formatted_plan(df)
    with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(plan)
    print(
        f"{name}_{SUFFIX}: {plan.count('Exchange')} exchanges, "
        f"{plan.count('HashAggregate') + plan.count('SortAggregate')} aggs, "
        f"{plan.count('Join')} joins"
    )


def louvain_fixture(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    ids = docs.select(F.col("doc_id").alias("id"))
    pairs = (
        ids.alias("a")
        .join(ids.alias("b"), F.expr("a.id % 7 = b.id % 7 AND a.id < b.id"))
        .filter("a.id < 450 AND b.id < 450")
        .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
    )
    frame = NetworkFrame(ids, pairs)
    wedges = _cut_lineage(
        _edge_pairs(frame, False)
        .filter(F.col("source") != F.col("target"))
        .select("source", "target", F.lit(1).cast("bigint").alias("w"))
    )
    nodes = frame.nodes.select("id")
    m2 = int(wedges.agg(F.sum("w").alias("m2")).first()["m2"] or 0)
    return frame, wedges, nodes, m2


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("capture_r17_plans")
    frame, wedges, nodes, m2 = louvain_fixture(spark)
    deg = wedges.groupBy(F.col("source").alias("id")).agg(
        F.sum("w").alias("__deg")
    )
    cross = wedges.filter(F.col("source") != F.col("target"))
    cur = _cut_lineage(nodes.select("id", F.col("id").alias("community")))
    vol = (
        cur.join(deg, on="id", how="left")
        .groupBy("community")
        .agg(F.sum(F.coalesce("__deg", F.lit(0))).alias("__vol"))
    )
    kvc = (
        cross.join(
            cur.select(
                F.col("id").alias("source"), F.col("community").alias("__nc")
            ),
            on="source",
        )
        .groupBy(F.col("target").alias("id"), "__nc")
        .agg(F.sum("w").alias("__k"))
    )

    # --- louvain move round (the r17 window shape, replicated from
    # _louvain_phase's round body) -------------------------------------
    from pyspark.sql import Window

    wid = Window.partitionBy("id")
    enriched = (
        kvc.join(cur, on="id")
        .join(deg, on="id", how="left")
        .select(
            "id", "community", "__nc", "__k",
            F.coalesce("__deg", F.lit(0)).alias("__deg"),
        )
        .withColumn(
            "__ka",
            F.coalesce(
                F.max(
                    F.when(F.col("__nc") == F.col("community"), F.col("__k"))
                ).over(wid),
                F.lit(0).cast("bigint"),
            ),
        )
    )
    cand = (
        enriched.filter(F.col("__nc") < F.col("community"))
        .join(vol.withColumnRenamed("__vol", "__vola"), on="community")
        .join(
            vol.select(
                F.col("community").alias("__nc"), F.col("__vol").alias("__volb")
            ),
            on="__nc",
        )
        .withColumn(
            "__gain",
            F.lit(m2).cast("decimal(38,0)") * (F.col("__k") - F.col("__ka"))
            - F.col("__deg").cast("decimal(38,0)")
            * (F.col("__volb") - F.col("__vola") + F.col("__deg")),
        )
        .filter(F.col("__gain") > 0)
    )
    moves = cand.groupBy("id").agg(
        F.expr("min_by(__nc, struct(-__gain, __nc))").alias("__new")
    )
    nxt = cur.join(moves, on="id", how="left").select(
        "id", F.coalesce("__new", "community").alias("community")
    )
    dump("louvain_move_round", nxt)

    # --- the merged accept collect (4 legs, one query) -----------------
    nxt_ck = _cut_lineage(nxt)

    def q_legs(lab, tag):
        internal_df = (
            wedges.join(
                lab.select(
                    F.col("id").alias("source"), F.col("community").alias("__la")
                ),
                on="source",
            )
            .join(
                lab.select(
                    F.col("id").alias("target"), F.col("community").alias("__lb")
                ),
                on="target",
            )
            .filter(F.col("__la") == F.col("__lb"))
            .agg(F.sum("w").cast("decimal(38,0)").alias("v"))
            .select(F.lit("i:" + tag).alias("k"), "v")
        )
        volsq_df = (
            lab.join(deg, on="id", how="left")
            .groupBy("community")
            .agg(F.sum(F.coalesce("__deg", F.lit(0))).alias("__vol"))
            .agg(
                F.sum(
                    F.col("__vol").cast("decimal(38,0)") * F.col("__vol")
                ).alias("v")
            )
            .select(F.lit("v:" + tag).alias("k"), "v")
        )
        return internal_df.unionByName(volsq_df)

    merged = q_legs(cur, "a").unionByName(q_legs(nxt_ck, "b"))
    dump("louvain_accept_q", merged)

    # --- HITS half-round ------------------------------------------------
    nf_nodes = frame.nodes.select("id")
    n = nf_nodes.count()
    e = (
        _edge_pairs(frame, True)
        .filter(F.col("source") != F.col("target"))
        .localCheckpoint(eager=False)
    )
    dec = "decimal(38,12)"
    zeros = nf_nodes.select(
        "id", F.lit(0).cast(dec).alias("__c")
    ).localCheckpoint(eager=False)
    h = nf_nodes.select("id", F.round(F.lit(1.0 / n), 12).alias("s"))
    raw_plan = (
        e.join(h.withColumnRenamed("id", "source"), on="source")
        .select(
            F.col("target").alias("id"),
            F.round(F.col("s"), 12).cast(dec).alias("__c"),
        )
        .unionByName(zeros)
        .rollup("id")
        .agg(F.sum("__c").alias("__raw"), F.grouping("id").alias("__g"))
    )
    # dump PRE-checkpoint so the aggregate shape is visible: the ROLLUP
    # computes per-id sums AND the L1 total in one aggregate — the
    # before side shows a plain groupBy here plus a SECOND full
    # aggregate pass over the checkpointed result for the total
    raw_all = raw_plan.localCheckpoint(eager=False)
    raw = raw_all.filter(F.col("__g") == 0).select("id", "__raw")
    tot = raw_all.filter(F.col("__g") == 1).select(
        F.col("__raw").alias("__tot")
    )
    half = raw.crossJoin(F.broadcast(tot)).select(
        "id",
        F.when(F.col("__raw") == 0, 0.0)
        .otherwise(
            F.round(
                F.col("__raw").cast("double") / F.col("__tot").cast("double"),
                12,
            )
        )
        .alias("s"),
    )
    dump("hits_half", half)
    dump("hits_half_agg", raw_plan)

    # --- neardup fold: the pairs-state plan of fold 2 -------------------
    from networkframe_spark.streaming.ops import neardup_increment

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    state = (None, None, None)
    for i in range(2):
        sl = docs.filter(F.col("doc_id") % 3 == i)
        prev = state
        state = neardup_increment(
            sl, *state, n_perm=16, n_bands=2, shingle_n=3, threshold=0.5,
            materialize=(SUFFIX != "before"),
        )
        if SUFFIX == "before":
            state = tuple(s.localCheckpoint(eager=True) for s in state)
    # fold 2's pairs plan, captured PRE-materialization: rebuild it
    # without the final checkpoint by calling once more lazily
    sl = docs.filter(F.col("doc_id") % 3 == 2)
    if SUFFIX == "before":
        d2, b2, p2 = neardup_increment(
            sl, *state, n_perm=16, n_bands=2, shingle_n=3, threshold=0.5
        )
        dump("neardup_fold_pairs", p2)
    else:
        # replicate materialize=True's internal pairs plan up to (but
        # not including) its final checkpoint: new-docs checkpoint,
        # docs/bands checkpoints, band rows re-sliced from the
        # checkpointed band table, then candidates + verify — the
        # whole subtree hangs off RDD scans, which is the point.
        from networkframe_spark.functions.dedup import (
            jaccard_verify,
            minhash_band_table,
        )

        docs_st, bands_st, pairs_st = state
        new_docs = (
            sl.select("doc_id", "text")
            .dropDuplicates(["doc_id"])
            .join(docs_st.select("doc_id"), on="doc_id", how="left_anti")
            .localCheckpoint(eager=True)
        )
        docs2 = docs_st.unionByName(new_docs).localCheckpoint(eager=True)
        bands2 = bands_st.unionByName(
            minhash_band_table(new_docs, "text", "doc_id", 16, 2, 3)
        ).localCheckpoint(eager=True)
        nb = bands2.join(
            new_docs.select(F.col("doc_id").alias("id")),
            on="id",
            how="left_semi",
        )
        cand = (
            nb.alias("a")
            .join(bands2.alias("b"), on=["band", "key"])
            .filter(F.col("a.id") != F.col("b.id"))
            .select(
                F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
            )
            .distinct()
            .join(
                pairs_st.select("id_a", "id_b"),
                on=["id_a", "id_b"],
                how="left_anti",
            )
        )
        p2 = pairs_st.unionByName(
            jaccard_verify(cand, docs2, "text", "doc_id", 3, 0.5)
        )
        dump("neardup_fold_pairs", p2)
    spark.stop()


if __name__ == "__main__":
    main()
