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


def click_purchase_join(events: DataFrame, horizon_minutes: int = 60) -> DataFrame:
    """Batch form of the stream-stream interval join: every (click,
    purchase) pair of the same user with the purchase inside
    [click_ts, click_ts + horizon] — the attribution join. Output keys
    are event ids + epoch-µs timestamps (gate-stable)."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        us.alias("click_ts_us"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        us.alias("purchase_ts_us"),
    )
    horizon_us = horizon_minutes * 60_000_000
    return clicks.join(
        purchases,
        [
            clicks.user_id == purchases.user_id,
            purchases.purchase_ts_us >= clicks.click_ts_us,
            purchases.purchase_ts_us <= clicks.click_ts_us + horizon_us,
        ],
    ).select(
        "click_event_id",
        clicks.user_id.alias("user_id"),
        "click_ts_us",
        "purchase_event_id",
        "purchase_ts_us",
    )


def streaming_click_purchase_join(
    spark: SparkSession,
    parquet_dir: str,
    schema,
    horizon_minutes: int = 60,
    watermark: str = "2 hours",
):
    """The same attribution join as a STREAM-STREAM inner join: both
    sides watermarked, the join condition carries the event-time range,
    so Structured Streaming can bound each side's join state (clicks
    older than watermark + horizon are evicted — at scale the state is
    the moving window, never the full history). The parity test feeds
    the identical rows through both forms."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("click_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id").alias("purchase_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"""
            click_user_id = purchase_user_id AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + INTERVAL {horizon_minutes} MINUTES
            """
        ),
    )
    return joined.select(
        "click_event_id",
        F.col("click_user_id").alias("user_id"),
        F.unix_micros("click_ts").alias("click_ts_us"),
        "purchase_event_id",
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
    )


def streaming_sessions(
    spark: SparkSession,
    parquet_dir: str,
    schema,
    gap_minutes: int = 30,
    watermark: str = "4 hours",
):
    """Native session windows over a stream: ``F.session_window`` with
    a watermark — the streaming-stateful form of the batch
    gaps-and-islands sessionize (operators/sessions.py). State per key
    is the OPEN sessions only; the watermark closes and evicts them.

    Boundary semantics: session_window merges events with gap < g
    where the batch operator splits on gap > g — they differ only when
    a gap equals g exactly (microsecond timestamps make that
    measure-zero; the parity test asserts equality on real data).
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            "user_id",
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            # same rounding RULE as the batch sessionize (round6, not
            # F.round's HALF_UP) so the only residual divergence is
            # sum-order noise, which the parity test bounds
            (F.floor(F.sum("value") * 1000000.0 + 0.5) / 1000000.0).alias(
                "total_value"
            ),
        )
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "total_value")
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


def streaming_dedup(
    spark: SparkSession,
    parquet_dir: str,
    schema,
    key_cols: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    max_files_per_trigger: int | None = None,
):
    """Watermarked streaming deduplication: the first arrival of each
    key within the watermark horizon survives, later duplicates are
    dropped, and — unlike plain ``dropDuplicates`` on a stream — state
    for keys older than the watermark is EVICTED, so state size is
    bounded by the horizon's key cardinality instead of the stream's
    full history (the property that makes stream dedup viable on an
    unbounded 100 TB feed). Spark's
    ``dropDuplicatesWithinWatermark`` supplies the operator; this
    wires the file source + event-time watermark around it.
    ``max_files_per_trigger`` is a test/replay knob (None lets the
    source batch files normally — the production setting)."""
    keys = key_cols or ["event_id"]
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(parquet_dir)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
