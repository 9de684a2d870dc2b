"""Count Spark JOBS (driver barriers) a declared query runs end-to-end.

Usage:
    python tools/job_count.py <query> [...]

For each query: set a job group, construct the DataFrame (eager
checkpoints / collects inside iterative operators run here), force it
with the noop sink, and report how many job ids landed in the group,
plus the wall.  The job count is DETERMINISTIC — same code, same data,
same count — so it survives the shared-host noise that makes raw walls
incomparable (r16/r17): for driver-barrier-bound queries (tiny-graph
iterative algorithms), fewer jobs IS the optimization, and the count
proves it moved.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from networkframe_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: python tools/job_count.py <query> [...]")
    qs = entry_mod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries {unknown}")
    spark = get_spark("job_count")
    sc = spark.sparkContext
    # warm parquet footers so the first query's count is comparable
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    for name in names:
        sc.setJobGroup(name, name)
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        jobs = sc.statusTracker().getJobIdsForGroup(name)
        print(f"{name}: jobs={len(jobs)} wall={dt:.2f}s", flush=True)
        sc.setJobGroup("", "")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
