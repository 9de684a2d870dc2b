"""Round-16 optimization measurement harness.

Times named headline queries solo (noop sink, best-of-N in a fresh
session) and dumps `.explain("formatted")` to plans/r16/<q>_<tag>.txt.

Usage:
  python tools/opt_measure.py --tag before q1 q2 ...     # time + plans
  python tools/opt_measure.py --tag before --plans-only q1 ...
  python tools/opt_measure.py --tag before --all-timings  # whole suite
Prints a JSON object {query: best_sec}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from networkframe_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "plans", "r16")


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--all-timings", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entry_mod.queries()
    names = args.queries
    if args.all_timings:
        import bench as bench_mod

        names = bench_mod.HEADLINE
    os.makedirs(PLANS, exist_ok=True)

    spark = get_spark("opt_measure")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        df = fn(spark, sf_dir)
        if not args.no_plans:
            with open(
                os.path.join(PLANS, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(formatted_plan(df))
        if args.plans_only:
            spark.catalog.clearCache()
            continue
        best = None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"opt:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)
    print(json.dumps(timings, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
