"""A/B the embedding_duplicates(mode="lsh") candidate-dedup plan at
corpus-self-join scale: the round-11 lsh_top_k plan fix (score before
deduplicating, so the pair-dedup exchange moves (id_a, id_b, cosine)
instead of 2 x dim embedding doubles) applies to the corpus x corpus
near-dup path too — and that path is THE 100 TB LSH case, because its
candidate count is quadratic-per-bucket rather than queries x corpus.

Subset of the frozen synthetic corpus (tools/bench_multiprobe_synth.py
freezes 500k x 64-dim uniform vectors to parquet; uniform data is the
LSH worst case — no cluster structure, so every bucket is full-sized
and almost no candidate survives the threshold: pure shuffle+score
stress).  "before" reconstructs the pre-fix plan from the same
primitives (join -> filter -> dropDuplicates on wide rows -> score ->
filter); "after" is the shipped _embedding_duplicates_lsh.  Both runs
alternate A/B/A/B after a warmup so JIT and page-cache effects cancel
(first Spark action in a process pays ~5s of JIT).

Usage: python tools/bench_embdedup_synth.py [n_vecs] [n_planes]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from networkframe_spark.session import get_spark

SCRATCH = "/root/repo/.scratch/synth_emb_500000"


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_planes = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_tables = 2
    threshold = 0.8
    spark = get_spark("bench_embdedup")

    emb = spark.read.parquet(SCRATCH).filter(F.col("vec_id") < n_vecs)
    emb.count()

    from networkframe_spark.functions.dedup import _embedding_duplicates_lsh
    from networkframe_spark.functions.similarity import (
        _hyperplane_signs,
        dot_expr,
        norm_expr,
        signature_col,
    )

    dim = 64
    tables = [
        _hyperplane_signs(n_planes, dim, seed=42 + 1000 * t)
        for t in range(n_tables)
    ]

    def banded():
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        return (
            emb.repartition(n_part)
            .select(
                F.col("vec_id").alias("id"),
                F.col("embedding").alias("emb"),
                norm_expr(F.col("embedding")).alias("norm"),
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(t).alias("table"),
                                signature_col(
                                    F.col("embedding"), tables[t]
                                ).alias("bucket"),
                            )
                            for t in range(n_tables)
                        ]
                    )
                ).alias("tb"),
            )
            .select(
                "id", "emb", "norm",
                F.col("tb.table").alias("table"),
                F.col("tb.bucket").alias("bucket"),
            )
        )

    def before_fix():
        b0 = banded()
        a = b0.select(
            "table", "bucket",
            F.col("id").alias("id_a"), F.col("emb").alias("emb_a"),
            F.col("norm").alias("norm_a"),
        )
        b = b0.select(
            "table", "bucket",
            F.col("id").alias("id_b"), F.col("emb").alias("emb_b"),
            F.col("norm").alias("norm_b"),
        )
        cand = (
            a.join(b, on=["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        return (
            cand.withColumn(
                "cosine",
                F.round(
                    dot_expr(F.col("emb_a"), F.col("emb_b"))
                    / (F.col("norm_a") * F.col("norm_b")),
                    6,
                ),
            )
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )

    def after_fix():
        return _embedding_duplicates_lsh(
            emb, "embedding", "vec_id", threshold, n_planes, n_tables, dim
        )

    def run(fn):
        t0 = time.time()
        n = fn().count()
        return round(time.time() - t0, 1), n

    run(after_fix)  # warmup (JIT, page cache) — not recorded
    out = {"n_vecs": n_vecs, "n_planes": n_planes, "n_tables": n_tables}
    times = {"before": [], "after": []}
    for _ in range(2):
        t, n_b = run(before_fix)
        times["before"].append(t)
        t, n_a = run(after_fix)
        times["after"].append(t)
    out["rows_before"] = n_b
    out["rows_after"] = n_a
    out["before_s"] = min(times["before"])
    out["after_s"] = min(times["after"])
    out["runs"] = times
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
