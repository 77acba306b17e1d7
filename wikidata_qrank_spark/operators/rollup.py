"""Hypertable-style rollup cascade: hour → day → week continuous
aggregates, each COARSER level re-aggregated from the next finer level
(never from raw) — the TimescaleDB/Druid pattern that makes a 100 TB
event store queryable at any resolution while reading raw data exactly
once.

Re-aggregation is only correct for associative measures, so the value
measure is fixed to integer cents at the hour level (``floor(v*100 +
0.5)``): bigint sums re-associate exactly, where double sums would
drift with aggregation order. The DuckDB oracle aggregates each level
DIRECTLY from raw events — associativity makes the two formulations
equal, and checking cascade-vs-direct is exactly the invariant a
continuous-aggregate implementation must keep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVELS = ("hour", "day", "week")


def rollup_cascade(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(level, bucket_us, event_type, n_events, value_c) for the hour,
    day and week resolutions. One raw scan (the hour aggregation);
    day/week aggregate the previous level's partials — at scale each
    cascade step shuffles only the coarser-bucket cardinality."""
    ts = F.col(ts_col).cast("timestamp")
    hour = (
        events.select(
            F.date_trunc("hour", ts).alias("bucket"),
            F.col(type_col).alias("event_type"),
            F.floor(F.col(value_col) * 100 + 0.5).cast("long").alias("value_c"),
        )
        .groupBy("bucket", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value_c").cast("long").alias("value_c"),
        )
    )

    def _coarsen(finer: DataFrame, unit: str) -> DataFrame:
        return (
            finer.groupBy(
                F.date_trunc(unit, F.col("bucket")).alias("bucket"), "event_type"
            )
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("value_c").cast("long").alias("value_c"),
            )
        )

    day = _coarsen(hour, "day")
    week = _coarsen(day, "week")

    def _tag(df: DataFrame, level: str) -> DataFrame:
        return df.select(
            F.lit(level).alias("level"),
            F.unix_micros(F.col("bucket")).alias("bucket_us"),
            "event_type",
            "n_events",
            "value_c",
        )

    return (
        _tag(hour, "hour")
        .unionByName(_tag(day, "day"))
        .unionByName(_tag(week, "week"))
    )


def merge_aggregate_state(
    state: DataFrame, delta_state: DataFrame, keys: list[str]
) -> DataFrame:
    """Incremental view maintenance for ADDITIVE aggregates: merge a
    stored partial-aggregate state with a new batch's partials (union +
    per-key re-sum). Every non-key column must be an additive measure
    (counts, integer sums) — the same associativity contract as
    :func:`rollup_cascade`. Correctness invariant (what the gate
    checks): merge(agg(base), agg(delta)) == agg(base ∪ delta), so an
    incremental pipeline never re-reads history to absorb a new batch.
    Shuffle cost ∝ |state| + |delta partials|, independent of the raw
    history size."""
    measures = [c for c in state.columns if c not in keys]
    if state.columns != delta_state.columns:
        raise ValueError(
            f"state/delta schema mismatch: {state.columns} vs {delta_state.columns}"
        )
    return (
        state.unionByName(delta_state)
        .groupBy(*keys)
        .agg(*[F.sum(c).cast("long").alias(c) for c in measures])
    )


def gap_fill(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    bucket_hours: int = 1,
) -> DataFrame:
    """(event_type, bucket_h, n_events, value_c, value_c_locf) — dense
    time-series per event type: every ``bucket_hours``-wide bucket
    between the type's first and last event exists in the output, empty
    buckets carry n_events=0 / value_c NULL, and value_c_locf fills
    gaps with the last observed value (TimescaleDB's time_bucket_gapfill
    + locf()).

    Scale shape: one raw aggregation shuffle, then the dense axis is
    generated from the per-type [min, max] bounds — sequence() on the
    KB-scale bounds table, NEVER a generate-then-join over raw events —
    and one window per type for the carry-forward. The dense-bucket
    row count is (time span / bucket), independent of event volume."""
    # truncating long division — the semantics DuckDB's `//` actually
    # has — so pre-1970 timestamps land in the same bucket in both
    # engines (round-5 ADVICE: the old sign-corrected floor diverged)
    from ..functions.precision import trunc_div

    b = trunc_div(
        f"unix_micros(CAST({ts_col} AS TIMESTAMP))",
        bucket_hours * 3_600_000_000,
    )
    agg = (
        events.select(
            F.col(type_col).alias("event_type"),
            b.alias("bucket_h"),
            F.floor(F.col(value_col) * 100 + 0.5).cast("long").alias("value_c"),
        )
        .groupBy("event_type", "bucket_h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value_c").cast("long").alias("value_c"),
        )
    )
    dense = (
        agg.groupBy("event_type")
        .agg(F.min("bucket_h").alias("lo"), F.max("bucket_h").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("bucket_h"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.join(agg, ["event_type", "bucket_h"], "left")
        .withColumn("n_events", F.coalesce("n_events", F.lit(0)).cast("long"))
        .withColumn(
            "value_c_locf", F.last("value_c", ignorenulls=True).over(w)
        )
    )
