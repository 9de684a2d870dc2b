"""OPQ A/B across data shapes (VERDICT r12 task 7) — plain PQ vs
OPQ-rotated PQ recall@10 vs exact L2, m=8, k_codes=256, 200 queries,
200k x 64-dim deterministic corpora:

- "aniso": per-dim scale 0.94^i, independent dims (axis-aligned
  variance decay).  Each PQ subspace trains its own codebook, so
  axis-aligned imbalance is already absorbed — expected wash.
- "corr": sharp decay 0.85^i then a fixed dense orthogonal mix
  (deterministic QR of md5 bytes), so the dominant variance
  directions are NOT axis-aligned and every subspace sees mixed
  correlated components — the shape OPQ exists for (Ge et al. 2013
  §1; real embeddings after PCA-ish training look like this).

Usage: python tools/bench_opq_shapes.py [aniso|corr|both]
Prints one JSON line per row; paste into SCALE.md.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from networkframe_spark.session import get_spark

N, K = 200_000, 10


def corpus_path(spark, shape: str) -> str:
    path = f"/root/repo/.scratch/synth_emb_{shape}_{N}"
    if os.path.exists(path):
        return path
    if shape == "aniso":
        (
            spark.range(N)
            .select(
                F.col("id").alias("vec_id"),
                F.array(
                    *[
                        (F.rand(seed=5000 + i) * 2 - 1) * (0.94**i)
                        for i in range(64)
                    ]
                ).alias("embedding"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(path)
        )
    else:  # corr
        raw = np.frombuffer(
            b"".join(
                hashlib.md5(f"mix:{i}".encode()).digest()
                for i in range(64 * 64 // 16)
            ),
            dtype=np.uint8,
        )
        Q, _ = np.linalg.qr(raw.astype(np.float64).reshape(64, 64) - 127.5)
        from networkframe_spark.functions.similarity import rotate_embeddings

        base = spark.range(N).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (F.rand(seed=7000 + i) * 2 - 1) * (0.85**i)
                    for i in range(64)
                ]
            ).alias("embedding"),
        )
        rotate_embeddings(base, Q.tolist()).repartition(32).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run(spark, shape: str) -> None:
    from networkframe_spark.functions.similarity import (
        brute_force_top_k,
        opq_rotation,
        pq_codebook,
        pq_encode,
        pq_search,
        rotate_embeddings,
    )

    emb = spark.read.parquet(corpus_path(spark, shape))
    emb.count()
    qs = emb.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = brute_force_top_k(
        emb, qs, k=K, query_id_col="query_id", exclude_self=False,
        metric="l2",
    ).localCheckpoint(eager=True)
    nt = truth.count()

    def recall(pred) -> float:
        p = (
            pred.filter(F.col("rank") <= K)
            .select("query_id", "vec_id")
            .dropDuplicates(["query_id", "vec_id"])
        )
        return round(
            truth.select("query_id", "vec_id")
            .join(p, on=["query_id", "vec_id"])
            .count()
            / nt,
            4,
        )

    cb = pq_codebook(emb, m=8, k=256, n_iter=3)
    print(
        json.dumps(
            {
                "row": f"{shape} pq raw m=8 k=256",
                "recall": recall(pq_search(pq_encode(emb, cb), cb, qs, k=K)),
            }
        ),
        flush=True,
    )
    t0 = time.time()
    R = opq_rotation(emb, m=8, k_codes=256, n_iter=4)
    t_train = round(time.time() - t0, 1)
    rot = rotate_embeddings(emb, R).localCheckpoint(eager=True)
    cb2 = pq_codebook(rot, m=8, k=256, n_iter=3)
    print(
        json.dumps(
            {
                "row": f"{shape} pq OPQ m=8 k=256",
                "recall": recall(
                    pq_search(
                        pq_encode(rot, cb2), cb2,
                        rotate_embeddings(qs, R), k=K,
                    )
                ),
                "train_sec": t_train,
            }
        ),
        flush=True,
    )


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = get_spark("bench_opq_shapes")
    for shape in ("aniso", "corr") if which == "both" else (which,):
        run(spark, shape)
    spark.stop()


if __name__ == "__main__":
    main()
