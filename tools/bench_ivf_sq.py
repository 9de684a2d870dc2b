"""Raw-cell IVF vs int8-SQ IVF A/B at real ANN scale — the bytes-read
and recall evidence for VERDICT r12 task 2 (SCALE.md row).

Same frozen 500k x 64-dim corpus as bench_ivfpq_recall /
bench_multiprobe_synth (seeded uniform, materialized once under
.scratch/), same n_lists=64 production config.  Rows:

- cells store size on disk (raw float64 + norm vs int8 codes + scale)
  — at a fixed n_probe the pruned scan reads bytes proportional to
  this, so the ratio IS the scan-cost ratio.
- recall@10 vs exact cosine truth at n_probe in {4, 16, 64} for both
  stores (64 = exhaustive: raw must be 1.0 by construction; SQ's gap
  from 1.0 is pure int8 rounding — the sq_topk 0.99/0.95 story).
- probe wall at each n_probe (best of 2; incidental, single host).

Usage: python tools/bench_ivf_sq.py [n_vecs] [n_queries]
Prints one JSON line per row; paste into SCALE.md.
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


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n_lists, k = 64, 10
    spark = get_spark("bench_ivf_sq")
    path = f"{SCRATCH}_{n_vecs}"
    if not os.path.exists(path):
        (
            spark.range(n_vecs)
            .select(
                F.col("id").alias("vec_id"),
                F.array(
                    *[F.rand(seed=1000 + i) * 2 - 1 for i in range(64)]
                ).alias("embedding"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(path)
        )
    emb = spark.read.parquet(path)
    emb.count()
    qs = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    from networkframe_spark.functions.similarity import (
        brute_force_top_k,
        build_ivf_index,
        build_ivf_sq_index,
        ivf_index_search,
        ivf_sq_search,
    )

    t0 = time.time()
    truth = brute_force_top_k(
        emb, qs, k=k, query_id_col="query_id", exclude_self=False
    ).localCheckpoint(eager=True)
    print(
        json.dumps(
            {"row": "brute cosine truth", "sec": round(time.time() - t0, 1)}
        ),
        flush=True,
    )

    raw_path = f"/root/repo/.scratch/ivf_raw_{n_vecs}_{n_lists}"
    sq_path = f"/root/repo/.scratch/ivf_sq_{n_vecs}_{n_lists}"
    t0 = time.time()
    build_ivf_index(emb, raw_path, n_lists=n_lists, n_iter=2, mode="overwrite")
    t_raw = round(time.time() - t0, 1)
    t0 = time.time()
    build_ivf_sq_index(
        emb, sq_path, n_lists=n_lists, n_iter=2, mode="overwrite"
    )
    t_sq = round(time.time() - t0, 1)
    raw_b = dir_bytes(os.path.join(raw_path, "cells"))
    sq_b = dir_bytes(os.path.join(sq_path, "cells"))
    print(
        json.dumps(
            {
                "row": f"cells store, n_lists={n_lists}",
                "raw_mb": round(raw_b / 1e6, 1),
                "sq_mb": round(sq_b / 1e6, 1),
                "ratio": round(raw_b / sq_b, 2),
                "build_sec_raw": t_raw,
                "build_sec_sq": t_sq,
            }
        ),
        flush=True,
    )

    def recall_of(df) -> float:
        pred = df.select("query_id", "vec_id").dropDuplicates(
            ["query_id", "vec_id"]
        )
        hits = (
            truth.select("query_id", "vec_id")
            .join(pred, on=["query_id", "vec_id"])
            .count()
        )
        return round(hits / truth.count(), 4)

    for n_probe in (4, 16, n_lists):
        for label, fn in (
            ("raw", lambda np=n_probe: ivf_index_search(
                spark, raw_path, qs, k=k, n_probe=np,
                query_id_col="query_id", exclude_self=False,
            )),
            ("sq8", lambda np=n_probe: ivf_sq_search(
                spark, sq_path, qs, k=k, n_probe=np,
                query_id_col="query_id", metric="cosine",
                exclude_self=False,
            )),
        ):
            best = None
            for _ in range(2):
                t0 = time.time()
                out = fn()
                out.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            r = recall_of(fn())
            print(
                json.dumps(
                    {
                        "row": f"ivf {label} n_probe={n_probe}/{n_lists}",
                        "recall@10": r,
                        "probe_sec": round(best, 1),
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
