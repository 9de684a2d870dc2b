"""A/B: candidate-pair cosine verify, JVM expression (interpreted
higher-order fold above the unroll gate) vs Arrow batch einsum — the
r15 follow-up to r14's known-dim unroll fix (VERDICT r14 task 5).

The unroll fixed dim <= 16; at production dims (64-4096) the banded
LSH per-pair verify in `_embedding_duplicates_lsh` still evaluated the
interpreted fold — the exact mechanism behind r14's 1.241 exponent
pathology.  This sweeps the clustered non-replicated embedding fixture
(`tools/bench_dedup_synth.clustered_embeddings`) at dims 64/256 and
two corpus sizes, at constant bucket density (planes =
round(log2(n/200))), timing verify="expr" vs verify="arrow" on the
IDENTICAL banding (result equality asserted on the smaller size).

Usage: python tools/bench_arrow_verify.py [n_small] [n_big]
(defaults 500_000 2_000_000; prints one JSON line)
"""

from __future__ import annotations

import json
import math
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from bench_dedup_synth import clustered_embeddings

from networkframe_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_small = int(args[0]) if args else 500_000
    n_big = int(args[1]) if len(args) > 1 else 2_000_000

    spark = get_spark("bench_arrow_verify")
    from networkframe_spark.functions.dedup import embedding_duplicates

    scratch = tempfile.mkdtemp(prefix="nfspark_arrowab_")
    out: dict = {}
    for dim in (64, 256):
        for n, tag in ((n_small, "small"), (n_big, "big")):
            if dim == 256 and n == n_big:
                # 2M x 256 doubles = 4 GB fixture; the 64-dim big run
                # already prices the big-n regime — keep 256 to the
                # crossover question (per-pair cost), not a second
                # big-n datapoint
                continue
            clustered_embeddings(spark, n, dim=dim).write.mode(
                "overwrite"
            ).parquet(f"{scratch}/emb_{dim}_{n}")
            emb = spark.read.parquet(f"{scratch}/emb_{dim}_{n}")
            planes = max(8, round(math.log2(n / 200)))
            res = {}
            for verify in ("expr", "arrow"):
                t0 = time.time()
                cnt = embedding_duplicates(
                    emb,
                    threshold=0.99,
                    mode="lsh",
                    dim=dim,
                    n_planes=planes,
                    verify=verify,
                ).count()
                res[verify] = {
                    "wall": round(time.time() - t0, 2),
                    "rows": cnt,
                }
                print(
                    f"  dim={dim} n={n} {verify}: {res[verify]['wall']}s "
                    f"rows={cnt}",
                    file=sys.stderr,
                )
                spark.catalog.clearCache()
            assert res["expr"]["rows"] == res["arrow"]["rows"], (dim, n, res)
            res["speedup_arrow"] = round(
                res["expr"]["wall"] / max(res["arrow"]["wall"], 0.01), 2
            )
            res["n_planes"] = planes
            out[f"dim{dim}_{tag}"] = res
    print(json.dumps({"metric": "arrow_verify_ab", "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
