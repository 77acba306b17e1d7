"""Structured Streaming over the events table.

The reference is strictly batch (SURVEY.md §2.8) — its freshness model
is re-run-and-skip. The Spark-native generalization is a streaming
variant of the same aggregation: windowed event counts with a watermark
for late data. ``windowed_event_counts`` is the batch expression of the
identical computation (and has a DuckDB oracle); the streaming test
feeds the same rows through ``readStream`` and asserts equal results —
the batch/stream parity Structured Streaming guarantees by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """(window_start, event_type, n_events, total_value) — tumbling
    window aggregation, batch form."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_event_counts(
    spark: SparkSession,
    parquet_dir: str,
    schema,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """The same aggregation as a streaming query over a parquet file
    source with watermarked event time. Returns the writeStream-ready
    DataFrame; callers pick sink/trigger (tests use memory sink +
    availableNow trigger)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_dir)
    )
    # parquet event time arrives as TIMESTAMP_NTZ; watermarks require
    # TIMESTAMP (session tz is pinned to UTC so the cast is lossless)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
