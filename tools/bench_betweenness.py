"""A/B measurement for betweenness_approx's forward-expansion
checkpoint-reuse lever (algorithms.py: the ``expansions`` list).

The lever: each forward round's frontier-expansion join (level ⋈
edges) is localCheckpoint'ed and REUSED by the matching backward
round, saving one edge-table join + frontier shuffle per backward
round at the cost of materializing frontier-incident-edge-sized
blocks.  This script times the flagship query shape
(``betweenness_approx([1,2,3], directed=False, max_hops=3)`` on the
sf0.1 customer-supplier graph, same as SCALE.md's solo rows) best-of-3
in a FRESH session per variant, variants interleaved run-to-run so
host drift hits both equally:

  reuse=True   — production path (checkpoint + reuse)
  reuse=False  — baseline (backward re-derives each expansion join)

Also prints a coarse stage split for the production path: forward
phase (force the deepest level) vs full query, measured in a separate
run so the split never contaminates the headline timing.

Usage: python tools/bench_betweenness.py [sf_dir]
Writes nothing; paste the JSON line into SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from networkframe_spark.session import get_spark
from networkframe_spark.sources import tpch_graph


def run_once(sf_dir: str, reuse: bool) -> float:
    from networkframe_spark.algorithms import betweenness_approx

    spark = get_spark(f"bench_btw_{reuse}")
    try:
        nf = tpch_graph(spark, sf_dir)
        t0 = time.time()
        betweenness_approx(
            nf, [1, 2, 3], directed=False, max_hops=3,
            _reuse_expansions=reuse,
        ).count()
        return time.time() - t0
    finally:
        spark.stop()


def stage_split(sf_dir: str) -> dict:
    """Forward-only vs full cost, production path, one fresh session."""
    from networkframe_spark import algorithms as A

    spark = get_spark("bench_btw_stages")
    try:
        nf = tpch_graph(spark, sf_dir)
        # forward-only: replicate the forward loop cost by running the
        # full operator but counting only the deepest level's rows is
        # not separable post-hoc, so time the full query and the
        # second run (checkpoints warm; backward + score phases
        # dominate the remainder) to bound the split.
        t0 = time.time()
        df = A.betweenness_approx(nf, [1, 2, 3], directed=False, max_hops=3)
        df.count()
        full_cold = time.time() - t0
        t0 = time.time()
        df2 = A.betweenness_approx(nf, [1, 2, 3], directed=False, max_hops=3)
        df2.count()
        full_warm = time.time() - t0
        return {"full_cold": round(full_cold, 2), "full_warm": round(full_warm, 2)}
    finally:
        spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs: dict[str, list[float]] = {"reuse": [], "noreuse": []}
    for _ in range(3):
        runs["reuse"].append(run_once(sf_dir, True))
        runs["noreuse"].append(run_once(sf_dir, False))
    split = stage_split(sf_dir)
    out = {
        "metric": "betweenness_reuse_ab",
        "sf_dir": sf_dir,
        "reuse_best": round(min(runs["reuse"]), 2),
        "noreuse_best": round(min(runs["noreuse"]), 2),
        "reuse_runs": [round(x, 2) for x in runs["reuse"]],
        "noreuse_runs": [round(x, 2) for x in runs["noreuse"]],
        "ratio_reuse_over_noreuse": round(
            min(runs["reuse"]) / min(runs["noreuse"]), 3
        ),
        "stage_split": split,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
