"""index_compact maintenance evidence (VERDICT r12 task 3 SCALE.md
row): after N incremental adds, what did the small files cost the
probe path, and what does compaction buy back?

Shape: build an int8 IVF store (n_lists=64) on an initial slice of
the frozen synthetic corpus, append the rest in N batches via
ivf_sq_index_add (the streaming duty cycle — each batch lands ~one
file per touched cell directory, so the store accumulates ~N files
per cell), then measure BEFORE vs AFTER index_compact:

- parquet file count in the store (the pruned scan opens one footer
  per file per probed cell),
- cold file-listing wall (fresh spark.read.parquet + a trivial
  partition-pruned count — the listing the probe path always pays),
- a pruned ivf_sq_search probe wall (n_probe=4, 50 queries, best of
  2),
- search result equality (the bit-identical contract, asserted).

Usage: python tools/bench_index_compact.py [n_vecs] [n_adds]
Prints one JSON line per row; paste into SCALE.md.
"""

from __future__ import annotations

import glob
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from networkframe_spark.session import get_spark

SCRATCH = "/root/repo/.scratch/synth_emb"


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_adds = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    n_lists = 64
    spark = get_spark("bench_index_compact")
    import os

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

    from networkframe_spark.functions.similarity import (
        build_ivf_sq_index,
        index_compact,
        ivf_sq_index_add,
        ivf_sq_search,
    )

    idx = f"/root/repo/.scratch/ivf_sq_compactbench_{n_vecs}"
    seed_n = n_vecs // (n_adds + 1)
    build_ivf_sq_index(
        emb.filter(F.col("vec_id") < seed_n), idx,
        n_lists=n_lists, n_iter=2, mode="overwrite",
    )
    t0 = time.time()
    for i in range(n_adds):
        lo, hi = seed_n * (i + 1), seed_n * (i + 2)
        batch = emb.filter(
            (F.col("vec_id") >= lo)
            & (F.col("vec_id") < (hi if i < n_adds - 1 else n_vecs))
        )
        # dedupe=False: batches are disjoint by construction, and the
        # point here is the file accumulation, not the retry guard
        ivf_sq_index_add(spark, idx, batch, dedupe=False)
    print(
        json.dumps(
            {"row": f"{n_adds} adds", "sec": round(time.time() - t0, 1)}
        ),
        flush=True,
    )

    qs = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def probe():
        return ivf_sq_search(
            spark, idx, qs, k=10, n_probe=4, query_id_col="query_id",
            exclude_self=False,
        )

    def listing_wall() -> float:
        # fresh reader = cold InMemoryFileIndex: pays the full
        # recursive listing, then a pruned single-cell count
        t0 = time.time()
        spark.read.parquet(idx + "/cells").filter(
            F.col("list_id") == 0
        ).count()
        return round(time.time() - t0, 2)

    def measure(tag: str) -> list:
        files = len(glob.glob(idx + "/cells/**/*.parquet", recursive=True))
        lw = listing_wall()
        best = None
        for _ in range(2):
            t0 = time.time()
            probe().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows = sorted(map(tuple, probe().collect()))
        print(
            json.dumps(
                {
                    "row": tag,
                    "files": files,
                    "listing_sec": lw,
                    "probe_sec": round(best, 1),
                }
            ),
            flush=True,
        )
        return rows

    before = measure(f"before compact ({n_adds} adds)")
    t0 = time.time()
    rep = index_compact(spark, idx)
    print(
        json.dumps(
            {"row": "index_compact", "sec": round(time.time() - t0, 1),
             **rep.get("cells", {})}
        ),
        flush=True,
    )
    after = measure("after compact")
    assert before == after, "compaction changed search results!"
    print(json.dumps({"row": "search bit-identical", "ok": True}))
    spark.stop()


if __name__ == "__main__":
    main()
