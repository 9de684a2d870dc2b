"""Multi-probe LSH cost/recall curve at REAL ANN scale: a synthetic
500k x 64-dim corpus (the fixture embeddings tables are 2k-20k
vectors — far below the size where banding pays for itself, and the
sf1 replica duplicates vectors so recall is trivially 1.0 there).

Corpus: seeded uniform vectors materialized to parquet once under
.scratch/ (rand() re-evaluates per action, so the frozen parquet is
what makes brute and LSH score the same values).  Queries: 200
corpus rows.  Reports wall time brute vs lsh_top_k at n_probe_bits
0/1/2 and recall@5 vs brute truth.

Expected shape (the claim SCALE.md records): brute is corpus x
queries and grows with BOTH; LSH banding is one corpus shuffle per
table + candidate-sized scoring, so at fixed corpus the probe knob
buys recall for candidate-scoring time only — and the whole curve
sits far below brute once corpus x queries dominates.

Usage: python tools/bench_multiprobe_synth.py [n_vecs] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from networkframe_spark.session import get_spark

SCRATCH = "/root/repo/.scratch/synth_emb"


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    dim = 64
    spark = get_spark("bench_mp_synth")
    path = f"{SCRATCH}_{n_vecs}"
    if not os.path.exists(path):
        (
            spark.range(n_vecs)
            .select(
                F.col("id").alias("vec_id"),
                F.array(
                    *[F.rand(seed=1000 + i) * 2 - 1 for i in range(dim)]
                ).alias("embedding"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(path)
        )
    emb = spark.read.parquet(path)
    emb.count()
    qs = emb.filter(F.col("vec_id") < n_q)

    from networkframe_spark.functions.similarity import (
        ann_recall_report,
        brute_force_top_k,
        lsh_top_k,
    )

    def best2(make):
        best = None
        for _ in range(2):
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    t_brute = best2(lambda: brute_force_top_k(emb, qs, k=5))
    print(
        json.dumps(
            {"n_vecs": n_vecs, "n_q": n_q, "config": "brute", "sec": t_brute}
        ),
        flush=True,
    )
    for npb in (0, 1, 2):
        t = best2(
            lambda: lsh_top_k(
                emb, qs, k=5, n_planes=4, n_tables=2, n_probe_bits=npb
            )
        )
        rep = (
            ann_recall_report(
                emb,
                qs,
                lsh_top_k(
                    emb, qs, k=5, n_planes=4, n_tables=2, n_probe_bits=npb
                ),
                k=5,
            )
            .agg(F.sum("n_truth").alias("t"), F.sum("n_hit").alias("h"))
            .first()
        )
        print(
            json.dumps(
                {
                    "n_vecs": n_vecs,
                    "n_q": n_q,
                    "config": f"lsh 4x2 probe{npb}",
                    "sec": t,
                    "recall": round(int(rep["h"]) / int(rep["t"]), 4),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
