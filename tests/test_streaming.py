"""Batch/stream parity for the windowed event aggregation."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from wikidata_qrank_spark.sources.tables import load_table
from wikidata_qrank_spark.streaming.events import (
    streaming_event_counts,
    windowed_event_counts,
)


def test_streaming_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    subset = events.limit(2000)
    src = str(tmp_path / "events_src")
    subset.coalesce(2).write.parquet(src)

    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_event_counts(spark.read.parquet(src)).collect()
    }

    stream_df = streaming_event_counts(spark, src, schema=events.schema)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("ev_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM ev_counts").collect()
    }
    assert got == batch
