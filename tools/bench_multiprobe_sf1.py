"""Cost-vs-recall curve for multi-probe LSH at sf0.1 and the synthetic
sf1 replica (600k vectors): times lsh_top_k at n_probe_bits 0/1/2 and
the brute-force baseline, 10 queries, k=5, 4 planes x 2 tables.

What it demonstrates for the 100 TB contract: probe fan-out multiplies
only the QUERY side of the band join (10 queries x 5 or 11 probes),
so wall time should stay near-flat in n_probe_bits while recall climbs
(SCALE.md RECALL table) — whereas the brute baseline scans
corpus x queries.

Usage: python tools/bench_multiprobe_sf1.py [sf01_dir] [sf1_dir]
Prints one JSON line per (sf, config); paste into SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from networkframe_spark.session import get_spark


def run(spark, sf_dir: str) -> None:
    from networkframe_spark.functions.similarity import (
        ann_recall_report,
        brute_force_top_k,
        lsh_top_k,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.count()  # warm footers
    n = emb.count()
    qs = emb.filter("vec_id < 10")
    label = sf_dir.rsplit("/", 1)[-1]

    def best2(make):
        best = None
        for _ in range(2):
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    t_brute = best2(lambda: brute_force_top_k(emb, qs, k=5))
    print(json.dumps({"sf": label, "n_vecs": n, "config": "brute", "sec": t_brute}))
    for npb in (0, 1, 2):
        t = best2(
            lambda: lsh_top_k(
                emb, qs, k=5, n_planes=4, n_tables=2, n_probe_bits=npb
            )
        )
        rep = ann_recall_report(
            emb,
            qs,
            lsh_top_k(emb, qs, k=5, n_planes=4, n_tables=2, n_probe_bits=npb),
            k=5,
        ).agg(F.sum("n_truth").alias("t"), F.sum("n_hit").alias("h")).first()
        print(
            json.dumps(
                {
                    "sf": label,
                    "n_vecs": n,
                    "config": f"lsh 4x2 probe{npb}",
                    "sec": t,
                    "recall": round(int(rep["h"]) / int(rep["t"]), 4),
                }
            )
        )


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    spark = get_spark("bench_multiprobe")
    run(spark, sf01)
    run(spark, sf1)
    spark.stop()


if __name__ == "__main__":
    main()
