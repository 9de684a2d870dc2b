"""Capture before/after round-body subplans for the r16 checkpoint→cache
partitioning fixes (see OPTIMIZATION_r16.md).

The full-query `.explain` of an iterative operator shows only the final
checkpoint scan, so — like the committed `edge_pairs_fused_*` and
`pagerank_roundbody_*` pairs — this captures ONE round body with the
step-static table held the old way (`localCheckpoint`, which reports
UnknownPartitioning and forces a per-round exchange) and the new way
(hash-partitioned `.cache()`, whose InMemoryRelation preserves
outputPartitioning).  Writes plans/r16/<name>_{before,after}.txt.

Usage: python tools/capture_r16_cache_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from networkframe_spark.session import get_spark
from networkframe_spark.sources import tpch_graph
from networkframe_spark.algorithms import _edge_pairs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "plans", "r16")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def dump(name: str, df) -> None:
    plan = formatted_plan(df)
    path = os.path.join(PLANS, f"{name}.txt")
    with open(path, "w") as f:
        f.write(plan)
    n_ex = plan.count("Exchange hashpartitioning")
    print(f"{name}: {n_ex} hash exchanges -> {path}")


def main() -> None:
    os.makedirs(PLANS, exist_ok=True)
    spark = get_spark("capture_r16_cache_plans")
    nf = tpch_graph(spark, SF_DIR)

    # ---- pagerank round body: share table checkpoint vs repart+cache
    edges = nf.edges.select("source", "target", F.lit(1.0).alias("w"))
    out_w = edges.groupBy("source").agg(
        F.sum(F.col("w").cast("decimal(28,6)")).cast("double").alias("w_out")
    )
    share = edges.join(out_w, on="source").select(
        "source", "target", (F.col("w") / F.col("w_out")).alias("share")
    )
    nodes = nf.nodes.select("id")
    zeros = nodes.select("id", F.lit(0).cast("bigint").alias("c"))
    pr0 = nodes.select("id", F.lit(0.001).alias("pr")).localCheckpoint(
        eager=True
    )

    def pr_round(e):
        return (
            e.join(pr0.withColumnRenamed("id", "source"), on="source")
            .select(
                F.col("target").alias("id"),
                F.floor(F.col("pr") * F.col("share") * F.lit(1e18)).alias("c"),
            )
            .unionByName(zeros)
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )

    e_old = share.localCheckpoint(eager=True)
    dump("pagerank_roundjoin_before", pr_round(e_old))
    e_new = share.repartition("source").cache()
    e_new.count()
    dump("pagerank_roundjoin_after", pr_round(e_new))
    e_new.unpersist()

    # ---- louvain accept test: double decoration vs fused kvc reuse
    wedges_plain = (
        _edge_pairs(nf, False)
        .filter(F.col("source") != F.col("target"))
        .select("source", "target", F.lit(1).cast("bigint").alias("w"))
        .localCheckpoint(eager=True)
    )
    lab = nodes.select("id", F.col("id").alias("community")).localCheckpoint(
        eager=True
    )
    internal_old = (
        wedges_plain.join(
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
    )
    dump("louvain_accept_internal_before", internal_old)
    wedges_new = (
        _edge_pairs(nf, False, partition_by_source=True)
        .filter(F.col("source") != F.col("target"))
        .select("source", "target", F.lit(1).cast("bigint").alias("w"))
        .cache()
    )
    wedges_new.count()
    kvc = (
        wedges_new.join(
            lab.select(
                F.col("id").alias("source"), F.col("community").alias("__nc")
            ),
            on="source",
        )
        .groupBy(F.col("target").alias("id"), "__nc")
        .agg(F.sum("w").alias("__k"))
        .localCheckpoint(eager=True)
    )
    internal_new = (
        kvc.join(lab, on="id")
        .filter(F.col("community") == F.col("__nc"))
        .agg(F.sum("__k").cast("decimal(38,0)").alias("v"))
    )
    dump("louvain_accept_internal_after", internal_new)
    # the kvc build itself (the ONE edge-sized op the fused round pays)
    kvc_live = wedges_new.join(
        lab.select(
            F.col("id").alias("source"), F.col("community").alias("__nc")
        ),
        on="source",
    ).groupBy(F.col("target").alias("id"), "__nc").agg(
        F.sum("w").alias("__k")
    )
    dump("louvain_kvc_build_after", kvc_live)
    wedges_new.unpersist()

    # ---- hits half-round: single checkpoint vs per-key cached copies
    hscores = nodes.select("id", F.lit(0.01).alias("s")).localCheckpoint(
        eager=True
    )
    dec = "decimal(38,12)"
    zeros_h = nodes.select("id", F.lit(0).cast(dec).alias("__c"))

    def hits_half(e, from_col, to_col):
        return (
            e.join(hscores.withColumnRenamed("id", from_col), on=from_col)
            .select(
                F.col(to_col).alias("id"),
                F.round(F.col("s"), 12).cast(dec).alias("__c"),
            )
            .unionByName(zeros_h)
            .groupBy("id")
            .agg(F.sum("__c").alias("__raw"))
        )

    e_hits_old = (
        _edge_pairs(nf, True)
        .filter(F.col("source") != F.col("target"))
        .localCheckpoint(eager=True)
    )
    dump("hits_halfround_before", hits_half(e_hits_old, "target", "source"))
    e_src = (
        _edge_pairs(nf, True, partition_by_source=True)
        .filter(F.col("source") != F.col("target"))
        .cache()
    )
    e_tgt = e_src.repartition("target").cache()
    e_tgt.count()
    dump("hits_halfround_after", hits_half(e_tgt, "target", "source"))
    e_src.unpersist()
    e_tgt.unpersist()

    # ---- betweenness forward expansion: checkpointed vs cached pairs
    seeds = nodes.limit(4).select(
        F.col("id").alias("seed"), "id", F.lit(1).cast("long").alias("sigma")
    ).localCheckpoint(eager=True)

    def bet_expansion(e):
        exp = (
            seeds.join(e.withColumnRenamed("source", "id"), on="id")
            .select("seed", "id", "sigma", F.col("target").alias("w"))
        )
        return (
            exp.select("seed", F.col("w").alias("id"), "sigma")
            .groupBy("seed", "id")
            .agg(F.sum("sigma").alias("sigma"))
        )

    e_bet_old = (
        _edge_pairs(nf, False, partition_by_source=True)
        .filter(F.col("source") != F.col("target"))
        .localCheckpoint(eager=True)
    )
    dump("betweenness_expansion_before", bet_expansion(e_bet_old))
    e_bet_new = (
        _edge_pairs(nf, False, partition_by_source=True)
        .filter(F.col("source") != F.col("target"))
        .cache()
    )
    e_bet_new.count()
    dump("betweenness_expansion_after", bet_expansion(e_bet_new))
    e_bet_new.unpersist()

    # ---- core_numbers h-index round: checkpointed vs cached nb table
    e_cn = nf.edges.select("source", "target").filter(
        F.col("source") != F.col("target")
    )
    und = e_cn.select(
        F.least("source", "target").alias("u"),
        F.greatest("source", "target").alias("v"),
    ).distinct()
    nb_plain = und.select(
        F.col("u").alias("id"), F.col("v").alias("nb")
    ).unionAll(und.select(F.col("v").alias("id"), F.col("u").alias("nb")))
    est = nb_plain.groupBy("id").agg(
        F.count(F.lit(1)).alias("est")
    ).localCheckpoint(eager=True)
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(
        F.col("nb_est").desc(), F.col("nb").asc()
    )

    def cn_round(nb):
        ranked = nb.join(
            est.select(F.col("id").alias("nb"), F.col("est").alias("nb_est")),
            on="nb",
        ).select("id", "nb", "nb_est", F.row_number().over(w).alias("rk"))
        return ranked.groupBy("id").agg(
            F.max(F.least(F.col("rk"), F.col("nb_est"))).alias("est")
        )

    nb_old = nb_plain.localCheckpoint(eager=True)
    dump("core_numbers_round_before", cn_round(nb_old))
    nb_new = nb_plain.repartition("nb").cache()
    nb_new.count()
    dump("core_numbers_round_after", cn_round(nb_new))
    nb_new.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
