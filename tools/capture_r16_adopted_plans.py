"""Capture before/after round-body subplans for the ADOPTED r16
checkpoint→cache conversions (label_propagation weighted round,
random_walks step join) — companions to capture_r16_cache_plans.py,
whose hits/core_numbers/louvain captures document experiments that the
interleaved A/B REJECTED (files renamed negresult_*).

Writes plans/r16/<name>_{before,after}.txt.

Usage: python tools/capture_r16_adopted_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from networkframe_spark.session import get_spark
from networkframe_spark.sources import tpch_graph
from networkframe_spark.algorithms import _edge_pairs, _weighted_pairs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "plans", "r16")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def dump(name: str, df) -> None:
    plan = formatted_plan(df)
    with open(os.path.join(PLANS, f"{name}.txt"), "w") as f:
        f.write(plan)
    print(
        f"{name}: {plan.count('Exchange hashpartitioning')} hash exch, "
        f"{plan.count('InMemoryTableScan')} cached scans"
    )


def main() -> None:
    os.makedirs(PLANS, exist_ok=True)
    spark = get_spark("capture_r16_adopted_plans")
    nf = tpch_graph(spark, SF_DIR)

    # ---- label_propagation WEIGHTED round: checkpoint vs cached pairs
    pairs_base = _weighted_pairs(
        nf, False, "weight", partition_by_source=True
    ).filter(F.col("source") != F.col("target"))
    labels = nf.nodes.select(
        "id", F.col("id").alias("community")
    ).localCheckpoint(eager=True)
    self_vote = F.lit(0.0).cast("decimal(28,6)")

    def lpw_round(pairs):
        votes = (
            pairs.join(
                labels.select(
                    F.col("id").alias("source"),
                    F.col("community").alias("nb_label"),
                ),
                on="source",
            )
            .select(
                F.col("target").alias("id"), "nb_label", F.col("w").alias("__v")
            )
            .unionByName(
                labels.select(
                    "id",
                    F.col("community").alias("nb_label"),
                    self_vote.alias("__v"),
                )
            )
            .groupBy("id", "nb_label")
            .agg(F.sum("__v").alias("n"))
        )
        return votes.groupBy("id").agg(
            F.expr("min_by(nb_label, struct(-n, nb_label))").alias("__new")
        )

    p_old = pairs_base.localCheckpoint(eager=True)
    dump("label_propagation_weighted_round_before", lpw_round(p_old))
    p_new = pairs_base.cache()
    p_new.count()
    dump("label_propagation_weighted_round_after", lpw_round(p_new))
    p_new.unpersist()

    # ---- random_walks step join: checkpointed vs cached ranked table
    from pyspark.sql import Window as w

    adj = _edge_pairs(nf, True, partition_by_source=True).filter(
        F.col("source") != F.col("target")
    )
    win = w.partitionBy("source")
    ranked_base = adj.select(
        "source",
        "target",
        (F.row_number().over(win.orderBy(F.col("target").asc())) - 1).alias(
            "rank"
        ),
        F.count(F.lit(1)).over(win).alias("deg"),
    )
    P = 1000003
    cur = nf.nodes.select(
        F.col("id").alias("start_id"), F.lit(0).alias("rep"),
        F.col("id").alias("id")
    ).localCheckpoint(eager=True)
    h = F.pmod(
        F.pmod(F.col("start_id"), F.lit(P)) * F.lit(1315423911)
        + F.col("rep") * F.lit(2654435761)
        + F.lit(97),
        F.lit(P),
    )

    def walk_step(ranked):
        c = cur
        return c.join(
            ranked,
            (c["id"] == ranked["source"])
            & (ranked["rank"] == F.pmod(h, ranked["deg"])),
        ).select("start_id", "rep", F.col("target").alias("id"))

    r_old = ranked_base.localCheckpoint(eager=True)
    dump("random_walks_step_before", walk_step(r_old))
    r_new = ranked_base.cache()
    r_new.count()
    dump("random_walks_step_after", walk_step(r_new))
    r_new.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
