"""Scale stress: synthetic graph ~10x sf0.1 to verify the operator
shapes (closure joins, quotient aggregation, contraction-based
components, k-hop aggregation) hold as data grows.

Usage: python tools/stress.py [n_nodes] [n_edges]
Prints one JSON line of wall times.  Not part of the driver contract —
engineering evidence that the plans scale, generated data (the driver
fixtures stop at sf0.1).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from networkframe_spark import NetworkFrame
from networkframe_spark.session import get_spark


def synthetic_graph(spark, n_nodes: int, n_edges: int) -> NetworkFrame:
    """Skewed random graph: hub-heavy targets (hash^2 concentrates
    mass on low ids) to exercise AQE skew handling, plus uniform
    sources.  Deterministic — no RNG state."""
    nodes = spark.range(n_nodes).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), F.lit(100))).cast("int").alias("grp"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10000)) / 100.0).alias("score"),
    )
    edges = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("source"),
        F.pmod(
            F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n_nodes))
            * F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n_nodes)),
            F.lit(n_nodes),
        ).alias("target"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100000)) / 100.0).alias("weight"),
    )
    return NetworkFrame(nodes, edges)


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark("stress")
    nf = synthetic_graph(spark, n_nodes, n_edges).persist()
    timings: dict[str, float] = {}

    def run(name, mk):
        best = None
        # best-of-2: the host shows multi-second interference spikes
        for _ in range(2):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 2)

    run("materialize", lambda: nf.edges)
    run("closure_filter", lambda: nf.query_nodes("score > 50").edges)
    run("condense", lambda: nf.condense("grp", func="sum", columns=["weight"]).edges)
    run("khop1_agg", lambda: nf.k_hop_aggregation(1, aggregations=["mean"], directed=False))
    best = None
    for _ in range(2):
        t0 = time.time()
        ncc = nf.n_connected_components(directed=False)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    timings["weak_components"] = round(best, 2)
    print(
        json.dumps(
            {
                "n_nodes": n_nodes,
                "n_edges": n_edges,
                "n_components": ncc,
                "timings": timings,
                "total": round(sum(timings.values()), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
