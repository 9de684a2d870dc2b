"""sf0.1 → sf1 scaling sweep for the HEAVY graph family on query
graphs that GROW WITH THE DATA (unlike the registered driver queries,
which pin fixed-size gadget graphs for oracle determinism): the
customer–supplier multigraph built from lineitem/orders, ~1.17M
symmetric pairs at sf0.1 and ~11.7M at the synthetic sf1 replica
(tools/make_sfscale.py key-shifts customers/suppliers, so the sf1
graph has 10x the nodes AND 10x the edges — constant density, the
shape a 10x data growth produces in production).

Ops: louvain, leiden, betweenness_approx, k_truss, core_numbers,
maximal_independent_set.  Round counts are pinned (the same bounded
variants the driver queries use) so the work per edge is comparable
across scales; exponent = log10(t_sf1 / t_sf0.1), 1.0 = linear in
data volume.  Each op runs best-of-2 in a shared session per sf
(fresh session per sf, heavy ops amortize JIT poorly otherwise).

Usage: python tools/bench_graph_sf1.py [sf01_dir] [sf1_dir]
Writes BENCH_GRAPH_SF1.json; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from networkframe_spark.session import get_spark
from networkframe_spark.sources import tpch_graph


def ops():
    from networkframe_spark import algorithms as A

    return {
        "louvain_2l1r": lambda nf: A.louvain_communities(
            nf, n_levels=2, n_rounds=1
        ),
        "leiden_2l1r": lambda nf: A.leiden_communities(
            nf, n_levels=2, n_rounds=1
        ),
        "betweenness_3seed_h3": lambda nf: A.betweenness_approx(
            nf, [1, 2, 3], directed=False, max_hops=3
        ),
        "k_truss_4_3r": lambda nf: A.k_truss(nf, k=4, max_rounds=3),
        "core_numbers_3r": lambda nf: A.core_numbers(nf, max_rounds=3),
        "mis": lambda nf: A.maximal_independent_set(nf),
    }


def sweep(sf_dir: str, n_runs: int = 2) -> dict[str, float]:
    spark = get_spark("bench_graph_scale")
    try:
        timings: dict[str, float] = {}
        for name, fn in ops().items():
            best = None
            for _ in range(n_runs):
                nf = tpch_graph(spark, sf_dir)
                t0 = time.time()
                fn(nf).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            timings[name] = round(best, 2)
            print(f"{sf_dir.rsplit('/', 1)[-1]} {name}: {best:.2f}s", flush=True)
        return timings
    finally:
        spark.stop()


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    t01 = sweep(sf01)
    t1 = sweep(sf1)
    payload = {
        "metric": "heavy_graph_family_scaling",
        "sf01": t01,
        "sf1": t1,
        "exponents": {
            k: round(math.log10(t1[k] / t01[k]), 3) if t01.get(k) else None
            for k in t1
        },
        "note": (
            "customer-supplier multigraph grown from lineitem; sf1 = 10x "
            "nodes and edges (constant density). Pinned round counts "
            "match the registered bounded variants."
        ),
    }
    with open("/root/repo/BENCH_GRAPH_SF1.json", "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps({k: payload["exponents"][k] for k in payload["exponents"]}))


if __name__ == "__main__":
    main()
