"""IVF-PQ recall@k vs exact-L2 brute truth at REAL ANN scale — the
quality counterweight to the "37x smaller index" size table
(SCALE.md round-11).

Same frozen 500k x 64-dim corpus as bench_multiprobe_synth (seeded
uniform, materialized once under .scratch/), same production config
as the r11 size/wall table: n_lists=64, m=8, k_codes=256, kmeans
coarse + codebook.  200 corpus rows as queries, recall@10 against
exact squared-L2 truth (brute_force_top_k(metric="l2") — L2 is what
the index approximates; cosine truth would charge it for metric
disagreement).

Rows:
- pq_search (exhaustive ADC, no cell pruning) — the PURE QUANTIZATION
  ceiling: no n_probe setting can beat this recall.
- ivfpq_search at n_probe in {4, 8, 16, 64} — quantization + pruning;
  n_probe=64 is exhaustive and must equal the pq_search row exactly
  (the no-residual contract the sf0.01 oracle pins).

Deterministic given the frozen corpus (seeded kmeans, stable argmins),
so this is a correctness-style measurement; wall times are incidental.

Usage: python tools/bench_ivfpq_recall.py [n_vecs] [n_queries]
Prints one JSON line per row; paste into SCALE.md's RECALL table.
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


def agg_recall(rep) -> dict:
    row = rep.agg(
        F.sum("n_truth").alias("t"), F.sum("n_hit").alias("h")
    ).first()
    t, h = int(row["t"] or 0), int(row["h"] or 0)
    return {
        "n_truth": t,
        "n_hit": h,
        "recall": round(h / t, 4) if t else None,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    clustered = "--clustered" in sys.argv
    n_vecs = int(args[0]) if args else 500_000
    n_q = int(args[1]) if len(args) > 1 else 200
    # coarse cell count: the decisive knob on clustered data — when
    # n_lists ~ the true cluster count, cells absorb the centers and
    # residual codes only have to resolve the within-cluster noise
    n_lists = int(args[2]) if len(args) > 2 else 64
    probes = sorted({4, 16, n_lists})
    k = 10
    spark = get_spark("bench_ivfpq_recall")
    if clustered:
        # 256 Gaussian-ish clusters, sigma 0.1 vs unit-scale centers:
        # the REALISTIC embedding shape (semantic embeddings cluster
        # hard) and the case residual encoding exists for — coarse
        # cells absorb the center offsets, codes resolve the noise.
        # Uniform (the default corpus) is PQ's worst case: cells
        # absorb almost nothing, so residual ≈ raw there.
        path = f"{SCRATCH}_clustered_{n_vecs}"
        if not os.path.exists(path):
            centers = spark.range(256).select(
                F.col("id").alias("cid"),
                F.array(
                    *[F.rand(seed=77000 + i) * 2 - 1 for i in range(64)]
                ).alias("center"),
            )
            (
                spark.range(n_vecs)
                .select(
                    F.col("id").alias("vec_id"),
                    (F.col("id") % 256).alias("cid"),
                    F.array(
                        *[F.rand(seed=88000 + i) * 2 - 1 for i in range(64)]
                    ).alias("noise"),
                )
                .join(F.broadcast(centers), on="cid")
                .select(
                    "vec_id",
                    F.zip_with(
                        "center", "noise", lambda c, n: c + 0.1 * n
                    ).alias("embedding"),
                )
                .repartition(32)
                .write.mode("overwrite")
                .parquet(path)
            )
    else:
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
        build_ivfpq_index,
        ivfpq_search,
        pq_search,
    )

    # exact L2 truth, self included (the quantized searchers do not
    # self-exclude); one pass, reused for every row via ann's approx arg
    t0 = time.time()
    truth = brute_force_top_k(
        emb, qs, k=k, query_id_col="query_id", exclude_self=False,
        metric="l2",
    ).localCheckpoint(eager=True)
    print(
        json.dumps(
            {"row": "brute L2 truth", "sec": round(time.time() - t0, 1)}
        ),
        flush=True,
    )

    tag = "clustered_" if clustered else ""
    idx_path = f"/root/repo/.scratch/ivfpq_recall_{tag}{n_vecs}_{n_lists}"
    t0 = time.time()
    art = build_ivfpq_index(
        emb, idx_path, n_lists=n_lists, m=8, k_codes=256, n_iter=2,
        residual=False, mode="overwrite",
    )
    t_build = round(time.time() - t0, 1)
    print(
        json.dumps({"row": f"ivfpq build {n_lists}/8/256", "sec": t_build}),
        flush=True,
    )

    def recall_of(approx_df, label: str) -> None:
        # same comparison as ann_recall_report, but against the ONE
        # precomputed truth — the report recomputes brute truth per
        # call, which at 500k x 200 x 5 rows would dominate every row
        t1 = time.time()
        pred = approx_df
        if "rank" in pred.columns:
            pred = pred.filter(F.col("rank") <= k)
        pred = pred.select("query_id", "vec_id").dropDuplicates(
            ["query_id", "vec_id"]
        )
        hits = truth.select("query_id", "vec_id").join(
            pred, on=["query_id", "vec_id"]
        ).groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
        perq = truth.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_truth")
        )
        rep = perq.join(hits, on="query_id", how="left").select(
            "query_id",
            F.col("n_truth"),
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
        )
        r = agg_recall(rep)
        print(
            json.dumps(
                {"row": label, **r, "sec": round(time.time() - t1, 1)}
            ),
            flush=True,
        )

    # int8 scalar quantization reference row: 8x compression, scored
    # by exact brute force over the DEQUANTIZED corpus (asymmetric —
    # queries stay full-precision, the standard storage trade).  The
    # contrast with the m=8 PQ rows prices compression in recall:
    # 8x (SQ) vs 64x (PQ codes) per vector.
    from networkframe_spark.functions.similarity import (
        dequantize_expr,
        quantize_embeddings,
    )

    sq = quantize_embeddings(emb)
    deq = sq.select(
        "vec_id",
        dequantize_expr(F.col("qembedding"), F.col("scale")).alias(
            "embedding"
        ),
    )
    recall_of(
        brute_force_top_k(
            deq, qs, k=k, query_id_col="query_id", exclude_self=False,
            metric="l2",
        ),
        "int8 scalar quantization (brute over dequantized)",
    )

    # quantization-only ceiling: exhaustive ADC over all codes
    codes = spark.read.parquet(os.path.join(idx_path, "codes")).select(
        "vec_id", "codes"
    )
    recall_of(
        pq_search(codes, art["codebook"], qs, k=k),
        "pq_search m=8 k=256 (quantization ceiling)",
    )
    for n_probe in probes:
        recall_of(
            ivfpq_search(spark, idx_path, qs, k=k, n_probe=n_probe),
            f"ivfpq_search n_probe={n_probe}/{n_lists}",
        )

    # exact rerank over oversampled ADC candidates (ann_rerank,
    # Jegou et al. 2011 re-rank-with-source-coding): codes prune to
    # k' candidates, full vectors are read ONLY for those pairs —
    # the recall a production deployment actually ships at, priced
    # against the raw-code rows above
    from networkframe_spark.functions.similarity import ann_rerank

    for kp in (20, 100):
        cand = ivfpq_search(spark, idx_path, qs, k=kp, n_probe=4)
        recall_of(
            ann_rerank(cand, emb, qs, k=k, metric="l2"),
            f"ivfpq n_probe=4/{n_lists} + exact rerank k'={kp}",
        )

    # residual A/B (classic IVFADC): same lists/m/k, codes quantize
    # x − centroid[cell]; search auto-detects via the meta manifest
    res_path = f"/root/repo/.scratch/ivfpq_recall_res_{tag}{n_vecs}_{n_lists}"
    t0 = time.time()
    build_ivfpq_index(
        emb, res_path, n_lists=n_lists, m=8, k_codes=256, n_iter=2,
        residual=True, mode="overwrite",
    )
    print(
        json.dumps(
            {
                "row": f"ivfpq residual build {n_lists}/8/256",
                "sec": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )
    for n_probe in probes:
        label = f"ivfpq_search residual n_probe={n_probe}/{n_lists}"
        try:
            recall_of(
                ivfpq_search(spark, res_path, qs, k=k, n_probe=n_probe),
                label,
            )
        except ValueError as e:
            # the residual LUT guard (n_q x n_probe x m x k must
            # broadcast) — record the boundary instead of crashing
            print(
                json.dumps({"row": label, "error": str(e)[:160]}),
                flush=True,
            )

    # the full production stack: residual codes + pruning + exact
    # rerank — what a real deployment ships
    cand = ivfpq_search(spark, res_path, qs, k=100, n_probe=4)
    recall_of(
        ann_rerank(cand, emb, qs, k=k, metric="l2"),
        f"ivfpq residual n_probe=4/{n_lists} + exact rerank k'=100",
    )

    if "--opq" in sys.argv:
        # round-13 (VERDICT r12 task 7): OPQ rotation A/B — same
        # lists/m/k as the residual rows, rotation learned offline on
        # a 50k hash-ordered sample, applied to BOTH variants so the
        # read cost is identical to the unrotated rows above
        from networkframe_spark.functions.similarity import opq_rotation

        t0 = time.time()
        R = opq_rotation(emb, m=8, k_codes=256, n_iter=4)
        print(
            json.dumps(
                {"row": "opq_rotation train (50k sample, 4 iters)",
                 "sec": round(time.time() - t0, 1)}
            ),
            flush=True,
        )
        for res_flag, tag2 in ((False, "raw"), (True, "residual")):
            opq_path = (
                f"/root/repo/.scratch/ivfpq_opq_{tag2}_{tag}{n_vecs}_{n_lists}"
            )
            build_ivfpq_index(
                emb, opq_path, n_lists=n_lists, m=8, k_codes=256,
                n_iter=2, residual=res_flag, rotation=R,
                mode="overwrite",
            )
            for n_probe in (4, n_lists):
                label = (
                    f"ivfpq OPQ {tag2} n_probe={n_probe}/{n_lists}"
                )
                try:
                    recall_of(
                        ivfpq_search(
                            spark, opq_path, qs, k=k, n_probe=n_probe
                        ),
                        label,
                    )
                except ValueError as e:
                    print(
                        json.dumps({"row": label, "error": str(e)[:160]}),
                        flush=True,
                    )
            cand = ivfpq_search(spark, opq_path, qs, k=100, n_probe=4)
            recall_of(
                ann_rerank(cand, emb, qs, k=k, metric="l2"),
                f"ivfpq OPQ {tag2} n_probe=4/{n_lists} + rerank k'=100",
            )
    spark.stop()


if __name__ == "__main__":
    main()
