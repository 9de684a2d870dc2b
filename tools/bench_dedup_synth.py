"""Non-replicated dedup scaling sweep (VERDICT r13 task 6): the
standing sf0.1→sf1 exponents for the banded dedup family were measured
on the driver fixture, whose every document is a 10-way byte-identical
replica — that collapses near-dup work toward the exact-hash case and
flatters (or distorts: `embedding_dedup_lsh` read 0.984) the exponent.
This sweep re-measures on CLUSTERED, NEVER-IDENTICAL synthetic data:

- text: `tools/stress.clustered_corpus` — clusters of 5 docs at
  within-cluster shingle Jaccard ≈0.6, every 7th cluster a singleton.
- embeddings: hash-derived clusters of 5 vectors around a shared
  center (cosine ≈0.999 within, ≈0 across), same singleton rule —
  near-dup structure without replicas, pair count O(n).

Exponent = log(w_big / w_small) / log(big / small); sublinear < 1.

`embedding_dedup_lsh` is swept at CONSTANT BUCKET DENSITY — `n_planes
= round(log2(n / 200))` per size (10 at 200k, 13 at 2M), which is how
the knob is meant to be driven: at fixed planes the same-bucket pair
count grows ~n²/2^planes (the 8-plane default would take hours at 2M),
while at constant density the candidate join scales with n.  The
exponent therefore prices the properly-operated gadget, banding cost
included.

Usage: python tools/bench_dedup_synth.py [n_small] [n_big]
         [--embedding-only | --skip-embedding]
(defaults 200_000 2_000_000; prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F
from stress import clustered_corpus

from networkframe_spark.session import get_spark


def clustered_embeddings(spark, n_vecs: int, dim: int = 16,
                         cluster_size: int = 5):
    """Near-dup embedding fixture: members share a hash-derived unit
    -scale center plus 3% per-vector noise (cosine ≈0.999 within a
    cluster, ≈0 across); every 7th cluster is a singleton.  No RNG
    state — xxhash64-derived like the text twin."""
    cluster = F.col("id") - F.pmod(F.col("id"), F.lit(cluster_size))
    base_key = F.when(
        F.pmod((cluster / cluster_size).cast("long"), F.lit(7)) == 0,
        F.col("id") + 10_000_019,
    ).otherwise(cluster)

    def u(key, i, salt):
        # uniform-ish in [-1, 1] from a hash
        return (
            F.pmod(F.xxhash64(key, F.lit(i), F.lit(salt)), F.lit(2001))
            - 1000
        ) / 1000.0

    return spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                u(base_key, i, 1) + 0.03 * u(F.col("id"), i, 2)
                for i in range(dim)
            ]
        ).alias("embedding"),
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    emb_only = "--embedding-only" in sys.argv
    skip_emb = "--skip-embedding" in sys.argv
    n_small = int(args[0]) if args else 200_000
    n_big = int(args[1]) if len(args) > 1 else 2_000_000
    import math
    import shutil
    import tempfile

    spark = get_spark("bench_dedup_synth")

    from networkframe_spark.functions.dedup import (
        build_minhash_index,
        embedding_duplicates,
        exact_duplicates,
        minhash_index_duplicates,
        minhash_lsh_duplicates,
        snm_duplicates,
    )

    walls: dict[str, dict] = {}

    def measure(name, size_tag, fn, reps=2):
        best, n_out = None, None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            n_out = out.count() if hasattr(out, "count") else out
            best = min(best or 1e9, time.time() - t0)
            spark.catalog.clearCache()
        walls.setdefault(name, {})[size_tag] = {
            "wall": round(best, 2),
            "rows": n_out,
        }
        print(f"  {name}@{size_tag}: {best:.2f}s rows={n_out}",
              file=sys.stderr)

    scratch = tempfile.mkdtemp(prefix="nfspark_dedupsweep_")
    for n, tag in ((n_small, "small"), (n_big, "big")):
        # materialize fixtures to parquet and read back: generated
        # (range->transform) relations carry tiny Catalyst size
        # estimates, which at 2M docs planned a shingle-table join as
        # BROADCAST and blew spark.driver.maxResultSize — file-based
        # stats give the planner the truth (and real pipelines read
        # files anyway)
        if not emb_only:
            clustered_corpus(spark, n).write.mode("overwrite").parquet(
                f"{scratch}/docs_{n}"
            )
            docs = spark.read.parquet(f"{scratch}/docs_{n}")
            measure(
                "exact_dedup", tag, lambda: exact_duplicates(docs)
            )
            measure(
                "minhash_lsh_dedup", tag,
                lambda: minhash_lsh_duplicates(docs, threshold=0.5),
            )
            measure(
                "snm_dedup", tag,
                lambda: snm_duplicates(docs, threshold=0.5),
            )

            def index_cycle():
                d = tempfile.mkdtemp(prefix="nfspark_dsweep_")
                try:
                    build_minhash_index(docs, f"{d}/idx", mode="overwrite")
                    return minhash_index_duplicates(
                        spark, f"{d}/idx", threshold=0.5
                    ).count()
                finally:
                    shutil.rmtree(d, ignore_errors=True)

            measure(
                "minhash_index_build_selfdup", tag, index_cycle, reps=1
            )
        if not skip_emb:
            clustered_embeddings(spark, n).write.mode("overwrite").parquet(
                f"{scratch}/emb_{n}"
            )
            emb = spark.read.parquet(f"{scratch}/emb_{n}")
            planes = max(8, round(math.log2(n / 200)))
            measure(
                "embedding_dedup_lsh", tag,
                lambda: embedding_duplicates(
                    emb, threshold=0.99, mode="lsh", dim=16,
                    n_planes=planes,
                ),
                reps=1,
            )
            walls["embedding_dedup_lsh"][tag]["n_planes"] = planes

    ratio = math.log(n_big / n_small)
    exps = {
        k: round(
            math.log(
                max(v["big"]["wall"], 0.01) / max(v["small"]["wall"], 0.01)
            )
            / ratio,
            3,
        )
        for k, v in walls.items()
    }
    print(
        json.dumps(
            {
                "n_small": n_small,
                "n_big": n_big,
                "walls": walls,
                "exponents": exps,
            }
        )
    )
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
