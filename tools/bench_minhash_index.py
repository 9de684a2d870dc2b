"""Measure the persisted-MinHash-index dedup duty cycle at corpus
scale: the claim is that once a corpus is banded into
`build_minhash_index`, an APPEND of d new docs costs
minhash_index_add(d) + minhash_index_duplicates(delta_docs=d) — a
map-side band of the delta plus a partition-pruned probe — instead of
re-shingling/re-signing/re-banding the accumulated corpus on every
cycle (what `dedup_corpus(method="minhash_lsh")` or a full index
rebuild does).

Corpus: tools/stress.clustered_corpus — clustered NON-replicated
near-dups (within-cluster shingle Jaccard ~0.6, no byte-identical
replicas), the fixture the replicated corpus_stress generator can't
provide.

Usage: python tools/bench_minhash_index.py [n_docs] [delta_docs]
Prints one JSON line of best-of-2 walls.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from stress import clustered_corpus

from networkframe_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_delta = int(sys.argv[2]) if len(sys.argv) > 2 else n_docs // 20
    threshold = 0.5
    spark = get_spark("bench_minhash_index")

    from networkframe_spark.functions.dedup import (
        build_minhash_index,
        minhash_index_add,
        minhash_index_duplicates,
        minhash_lsh_duplicates,
    )

    base = clustered_corpus(spark, n_docs).persist()
    base.count()
    delta = (
        clustered_corpus(spark, n_docs + n_delta)
        .filter(f"doc_id >= {n_docs}")
        .persist()
    )
    delta.count()
    both = base.unionByName(delta)

    root = tempfile.mkdtemp(prefix="nfspark_mhbench_")
    t: dict[str, float] = {}

    def wall(name, fn, n=2):
        best = None
        for _ in range(n):
            t0 = time.time()
            out = fn()
            best = min(best or 1e9, time.time() - t0)
        t[name] = round(best, 2)
        return out

    # one-time banding of the base corpus (amortized across cycles)
    t0 = time.time()
    build_minhash_index(base, f"{root}/base", mode="overwrite")
    t["build_base_once"] = round(time.time() - t0, 2)

    # the incremental cycle: append the delta, dedup ONLY the delta
    t0 = time.time()
    minhash_index_add(spark, f"{root}/base", delta)
    t["index_add_delta"] = round(time.time() - t0, 2)
    n_delta_pairs = wall(
        "selfdup_delta_probe",
        lambda: minhash_index_duplicates(
            spark, f"{root}/base", threshold, delta_docs=delta
        ).count(),
    )

    # status quo A: full re-band into a fresh index + full self-join
    def rebuild():
        shutil.rmtree(f"{root}/re", ignore_errors=True)
        build_minhash_index(both, f"{root}/re", mode="overwrite")
        return minhash_index_duplicates(spark, f"{root}/re", threshold).count()

    n_full_pairs = wall("rebuild_plus_selfdup", rebuild)

    # status quo B: the transient one-call (shingle-verify decision)
    n_lsh_pairs = wall(
        "transient_minhash_lsh",
        lambda: minhash_lsh_duplicates(both, threshold=threshold).count(),
    )

    # full selfdup on the post-add store (what a from-scratch consumer
    # of the already-built index pays — no re-banding, but all pairs)
    n_store_pairs = wall(
        "selfdup_full_store",
        lambda: minhash_index_duplicates(
            spark, f"{root}/base", threshold
        ).count(),
    )

    shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_delta": n_delta,
                "threshold": threshold,
                "pairs_delta": n_delta_pairs,
                "pairs_full": n_full_pairs,
                "pairs_transient": n_lsh_pairs,
                "pairs_full_store": n_store_pairs,
                "walls_sec": t,
                "cycle_incremental": round(
                    t["index_add_delta"] + t["selfdup_delta_probe"], 2
                ),
                "cycle_rebuild": t["rebuild_plus_selfdup"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
