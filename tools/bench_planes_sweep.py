"""Sweep LSH plane count for embedding_duplicates(mode="lsh") on the
clustered non-replicated fixture, measuring WALL and RECALL on planted
pairs — the r15 follow-up: the Arrow-verify A/B proved the win is fewer
CANDIDATES, not a faster verify (both modes pay the candidate join's
shuffle width identically), so the lever is bucket density = n / 2^planes.

Planted truth: `clustered_embeddings` builds clusters of 5 at cosine
~0.999 (every 7th cluster a singleton), so ground truth is the exact
cosine >= threshold evaluation over SAME-CLUSTER pairs only (id-derived
cluster key — n/5 * C(5,2) pairs, linear work, no all-pairs scan).
Recall = |found ∩ truth| / |truth| per plane count.

Usage: python tools/bench_planes_sweep.py [n_small] [n_big] [dim]
(defaults 500_000 2_000_000 64; prints one JSON line; run on an idle
host, sizes swept serially)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from bench_dedup_synth import clustered_embeddings
from pyspark.sql import functions as F

from networkframe_spark.session import get_spark

THRESHOLD = 0.99
CLUSTER_SIZE = 5


def planted_truth(spark, emb_path: str):
    """Exact cosine >= THRESHOLD over same-cluster pairs only."""
    from networkframe_spark.functions.similarity import dot_expr, norm_expr

    emb = spark.read.parquet(emb_path).select(
        "vec_id",
        (F.col("vec_id") - F.pmod(F.col("vec_id"), F.lit(CLUSTER_SIZE)))
        .alias("cl"),
        F.col("embedding").alias("e"),
        norm_expr(F.col("embedding")).alias("nm"),
    )
    a = emb.select("cl", F.col("vec_id").alias("id_a"),
                   F.col("e").alias("ea"), F.col("nm").alias("na"))
    b = emb.select("cl", F.col("vec_id").alias("id_b"),
                   F.col("e").alias("eb"), F.col("nm").alias("nb"))
    return (
        a.join(b, on="cl")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(
                dot_expr(F.col("ea"), F.col("eb"))
                / (F.col("na") * F.col("nb")), 6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= THRESHOLD)
        .select("id_a", "id_b")
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_small = int(args[0]) if args else 500_000
    n_big = int(args[1]) if len(args) > 1 else 2_000_000
    dim = int(args[2]) if len(args) > 2 else 64

    spark = get_spark("bench_planes_sweep")
    from networkframe_spark.functions.dedup import embedding_duplicates

    scratch = tempfile.mkdtemp(prefix="nfspark_planes_")
    out: dict = {}
    for n, tag in ((n_small, "small"), (n_big, "big")):
        path = f"{scratch}/emb_{n}"
        clustered_embeddings(spark, n, dim=dim).write.mode(
            "overwrite"
        ).parquet(path)
        emb = spark.read.parquet(path)
        truth = planted_truth(spark, path).localCheckpoint(eager=True)
        n_truth = truth.count()
        res = {"n_truth": n_truth, "sweep": {}}
        # density-relative range: bucket_rows from ~300 down to ~30
        # (below ~30 the banding overhead dominates; above ~300 the
        # per-bucket pair quadratic dominates — measured: 500k at
        # planes=10 (~490 rows/bucket, ~1.5B candidate pairs) = 641s,
        # and ~980 rows ran >12 min before being killed; the blowup is
        # the thing the density policy exists to avoid, so one
        # measured dense point (kept in SCALE.md) documents it)
        import math

        lo = max(8, round(math.log2(n / 300)))
        hi = min(16, round(math.log2(n / 30)))
        for planes in range(lo, hi + 1):
            t0 = time.time()
            found = embedding_duplicates(
                emb, threshold=THRESHOLD, mode="lsh", dim=dim,
                n_planes=planes,
            ).select("id_a", "id_b").localCheckpoint(eager=True)
            wall = round(time.time() - t0, 2)
            n_found = found.count()
            n_hit = found.join(truth, on=["id_a", "id_b"]).count()
            res["sweep"][str(planes)] = {
                "wall": wall,
                "found": n_found,
                "recall": round(n_hit / max(n_truth, 1), 6),
                "bucket_rows": round(n / 2 ** planes, 1),
            }
            print(
                f"  n={n} planes={planes}: {wall}s found={n_found} "
                f"recall={res['sweep'][str(planes)]['recall']}",
                file=sys.stderr,
            )
            spark.catalog.clearCache()
        out[tag] = res
    print(json.dumps({"metric": "planes_sweep", "dim": dim,
                      "threshold": THRESHOLD, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
