"""Structured Streaming entry points for the event stream.

Drives the batch-defined transformations of :mod:`.ops` under
``readStream``: parquet-directory source (driver fixtures) → watermark
→ windowed aggregation → memory/foreachBatch sink.  At scale the source
becomes Kafka and the sink a Delta/parquet table — the transformation
plan is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events_windowed(
    spark: SparkSession,
    source_dir: str,
    schema,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "events_windowed",
):
    """Streaming tumbling-window counts with late-data watermarking.

    Returns the started StreamingQuery writing to an in-memory sink
    (for tests, ``query.processAllAvailable()`` then read
    ``spark.table(query_name)``).
    """
    events = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 4)
        .load(source_dir)
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.col("event_type"),
            F.window(F.col("ts"), window_duration)["start"].alias("window_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
