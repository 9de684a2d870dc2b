"""Common-18 scaling sweep at the synthetic sf1 (tools/make_sfscale.py):
records BENCH_SF1.json with per-query sf1 timings, the sf0.1 timings
from BENCH_LOCAL.json, and the scaling exponent
log10(t_sf1 / t_sf0.1) — 1.0 = linear in data volume, > 1 superlinear.

Usage: python tools/bench_sf1.py [sf1_dir] [n_runs]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from bench import COMMON18
from networkframe_spark.session import get_spark

# round-12: the banded-LSH ops join the standing exponent sweep (the
# graph family has bench_graph_sf1.py; these run fine on the replica
# because banding cost is corpus-shuffle-shaped, not gadget-pinned)
EXTRA_OPS = [
    "embedding_dedup_lsh",
    "lsh_multiprobe_recall",
    # round-12: order-based blocking joins the sweep — its cost is one
    # global range-sort + an O(n x window) block equi-join, so the
    # exponent should track the sort exchange (~linear ceiling)
    "sorted_neighborhood",
    # round-13 (VERDICT r12 task 6): the persisted-index probe paths.
    # Each registered query BUILDS its index then probes it, so the
    # exponent blends offline build (≈linear: band/assign + partitioned
    # write) with the online probe (sublinear: partition-pruned scan) —
    # the honest end-to-end cost of the gadget at 10x data.  The two
    # r13 int8 registrations ride along (ivf_sq_compacted adds the
    # add + compact maintenance legs).
    "lsh_index_search",
    "ivfpq_search",
    "ivf_sq_search",
    "ivf_sq_compacted",
    # round-13 curation ops: budget selection is a range-sort prefix
    # sum (expect ~sort-bounded), DSIR is token-keyed joins over
    # token-count tables (~linear in distinct tokens), Gumbel top-k is
    # a map-side expression + TakeOrdered (~scan-bounded)
    "select_under_budget",
    "dsir_weights",
    "gumbel_topk",
    # persisted MinHash decontamination index (build + probe)
    "minhash_index_decon",
    # round-14: the index-backed dedup duty cycle (build + self-join),
    # its delta mode (build + add + pruned delta probe), the OPQ
    # rotate->encode->ADC path, and the retraction lifecycle
    # (build + remove + probe)
    "minhash_index_dup",
    "minhash_index_dup_delta",
    "ivfpq_opq",
    "minhash_index_removed",
    # round-15: the persisted inverted text index (each registered
    # query builds the index then probes, so the exponent blends the
    # ≈linear offline tokenize+write with the pruned online probe);
    # the batch variant adds the multi-query retrieval-run shape
    "text_index_search",
    "text_index_added",
    "text_index_batch",
]


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("bench_sf1")
    qs = entry_mod.queries()
    spark.read.parquet(os.path.join(sf1_dir, "region.parquet")).count()
    base = {}
    blp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_LOCAL.json")
    if os.path.exists(blp):
        base = json.load(open(blp)).get("queries", {})
    timings = {}
    sweep = COMMON18 + EXTRA_OPS
    # the persisted-index ops are excluded from bench.py's HEADLINE
    # (their walls are build-dominated) so BENCH_LOCAL has no sf0.1
    # point for them — time those here at sf0.1 with the same
    # best-of-N so the exponent compares like with like
    sf01_dir = "/root/testdata/sf0.1"
    for name in sweep:
        if name not in base:
            best = None
            for _ in range(n_runs):
                t0 = time.time()
                qs[name](spark, sf01_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            base[name] = round(best, 3)
            print(f"SF0.1 {name}: {best:.2f}s (local baseline)", flush=True)
    for name in sweep:
        best = None
        for _ in range(n_runs):
            t0 = time.time()
            qs[name](spark, sf1_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 3)
        b = base.get(name)
        exp = round(math.log10(best / b), 3) if b and b > 0 else None
        print(f"SF1 {name}: {best:.2f}s  (sf0.1 {b}s, exponent {exp})", flush=True)
    payload = {
        "metric": "common18_sf1_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf01_reference": {k: base.get(k) for k in sweep},
        "exponents": {
            k: (round(math.log10(timings[k] / base[k]), 3)
                if base.get(k) else None)
            for k in sweep
        },
        "sf": 1.0,
        "note": "synthetic sf1 = key-shifted 10x replication of sf0.1 (tools/make_sfscale.py)",
    }
    with open("/root/repo/BENCH_SF1.json", "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"total": payload["value"], "n": len(timings)}))
    spark.stop()


if __name__ == "__main__":
    main()
