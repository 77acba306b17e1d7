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


def test_streaming_qviews_matches_batch(spark, tmp_path):
    """Incremental mention counting over a document file-stream equals
    the batch qviews — the stream-static broadcast mention join keeps
    the exact batch code path (spans + text_mentions) stateless."""
    from wikidata_qrank_spark.operators.linking import canonical_dictionary
    from wikidata_qrank_spark.operators.mentions import text_mentions
    from wikidata_qrank_spark.sources.interleaved import dictionary, redirects, spans
    from wikidata_qrank_spark.streaming.mentions import streaming_docs, streaming_qviews

    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    src = str(tmp_path / "docs_src")
    docs.coalesce(3).write.parquet(src)
    static_docs = spark.read.parquet(src)

    d = dictionary(static_docs)
    cdict = canonical_dictionary(d, redirects(d))
    batch = {
        (r.item_id, r["count"])
        for r in text_mentions(spans(static_docs), cdict)
        .groupBy("item_id")
        .count()
        .collect()
    }

    stream = streaming_docs(spark, src, schema=static_docs.schema)
    q = (
        streaming_qviews(stream, cdict)
        .writeStream.format("memory")
        .queryName("qviews_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.item_id, r.views)
        for r in spark.sql("SELECT * FROM qviews_stream").collect()
    }
    assert got == batch
