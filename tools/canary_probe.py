"""One-shot host-speed probe: the bench.py canary (fixed pure-Spark
workload, zero project code) after the same untimed warmup.  Prints a
single line ``canary <sec>``.  Use before trusting any wall-clock
measurement on this shared-hardware sandbox (good host reads ~3.0 s;
r16/r17 saw degraded windows of 4-9 s).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import canary_wall  # noqa: E402
from networkframe_spark.session import get_spark  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    spark = get_spark("canary_probe")
    spark.range(1_000_000).select(
        (F.col("id") % 1000).alias("k")
    ).groupBy("k").count().collect()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    for _ in range(n):
        print(f"canary {canary_wall(spark)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
