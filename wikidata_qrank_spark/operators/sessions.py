"""Event sessionization — gaps-and-islands over the events table.

The engine-extension twin of the streaming windowed aggregation: assign
every event to a per-user session (a new session starts after a silence
longer than ``gap_minutes``), then aggregate per session. Classic
two-window shape: lag() to flag session starts, running sum of flags as
the session sequence. Both windows and the final session aggregation
share the (user_id) hash partitioning, so the whole operator runs over
ONE exchange (verified in the executed plan: 2 chained Window operators,
1 Exchange, no shuffle before the groupBy).

Timestamps compare in microseconds (unix_micros ↔ DuckDB epoch_us) so
the oracle is bit-exact; parquet TIMESTAMP_NTZ is cast to session-UTC
timestamp first, same as streaming/events.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.precision import round6


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_seq, session_start, session_end, n_events,
    total_value) — one row per user session."""
    ts = F.col("ts").cast("timestamp")
    us = F.unix_micros(ts)
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(us).over(order)
    is_new = F.when(prev.isNull() | ((us - prev) > gap_us), F.lit(1)).otherwise(
        F.lit(0)
    )
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = events.select("user_id", "ts", "event_id", "value").withColumn(
        "__new", is_new
    )
    sessions = flagged.withColumn(
        "session_seq", F.sum("__new").over(running).cast("long")
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        round6(F.sum("value")).alias("total_value"),
    )
