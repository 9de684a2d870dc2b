"""SparkSession factory tuned for this engine.

Local-mode defaults match the driver environment (local[32], 128 GiB,
single JVM); on a real cluster the same settings are sane starting
points — AQE handles runtime re-planning (skew joins on hub nodes,
partition coalescing), and shuffle partitions should be overridden to
~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "networkframe_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Python workers must be able to import this package by name:
    # cloudpickle serializes module-level helpers referenced from
    # mapInPandas closures (e.g. round_half_up in pq_encode) BY
    # REFERENCE, so a driver launched from any cwd other than the repo
    # root used to die with ModuleNotFoundError in the worker.  Export
    # the package's parent dir on PYTHONPATH before the JVM (and its
    # python worker daemons) start; on a real cluster the package ships
    # via --py-files / a wheel and this is a no-op addition.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def shuffle_partitions(spark: SparkSession) -> int:
    """The session's shuffle-partition count as an int, tolerating
    platforms where ``spark.sql.shuffle.partitions`` is the literal
    string ``"auto"`` (AQE auto-coalescing) — falls back to the
    cluster's default parallelism.  Use this anywhere an operator
    needs an explicit partition count for ``repartitionByRange`` /
    salting fan-out instead of int()-ing the conf directly."""
    raw = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        return int(raw)
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism
