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


def test_sessionize_gap_semantics(spark):
    """30-min silence starts a new session; adjacent events within the
    gap share one; plan uses a single exchange."""
    from datetime import datetime

    from wikidata_qrank_spark.operators.sessions import sessionize

    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), 7, "a", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 10, 0), 7, "a", 2.0, "{}"),
        (3, datetime(2024, 1, 1, 11, 0, 0), 7, "a", 4.0, "{}"),   # 50 min gap → new
        (4, datetime(2024, 1, 1, 10, 0, 0), 8, "a", 8.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        (r.user_id, r.session_seq): (r.n_events, r.total_value)
        for r in sessionize(events, gap_minutes=30).collect()
    }
    assert out == {(7, 1): (2, 3.0), (7, 2): (1, 4.0), (8, 1): (1, 8.0)}

    plan = sessionize(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange ") == 1


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (watermarked both sides, event-time
    range in the join condition) produces exactly the batch attribution
    join over the same rows."""
    from wikidata_qrank_spark.streaming.events import (
        click_purchase_join,
        streaming_click_purchase_join,
    )

    events = load_table(spark, SF_SMOKE, "events")
    subset = events.limit(3000)
    src = str(tmp_path / "ev_join_src")
    subset.coalesce(3).write.parquet(src)

    batch = {
        (r.click_event_id, r.purchase_event_id)
        for r in click_purchase_join(spark.read.parquet(src)).collect()
    }
    assert len(batch) > 0  # non-vacuous

    stream_df = streaming_click_purchase_join(spark, src, schema=events.schema)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("cp_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.click_event_id, r.purchase_event_id)
        for r in spark.sql("SELECT * FROM cp_join").collect()
    }
    assert got == batch


def test_streaming_session_windows_match_batch_sessionize(spark, tmp_path):
    """Native streaming session_window sessions == batch
    gaps-and-islands sessions on the same rows (session identity =
    (user, start); boundary gaps are measure-zero and absent here)."""
    from wikidata_qrank_spark.operators.sessions import sessionize
    from wikidata_qrank_spark.streaming.events import streaming_sessions

    events = load_table(spark, SF_SMOKE, "events")
    subset = events.limit(2500)
    src = str(tmp_path / "sess_src")
    subset.coalesce(2).write.parquet(src)

    batch = {
        (r.user_id, r.session_start): (r.n_events, r.total_value)
        for r in sessionize(spark.read.parquet(src), gap_minutes=30).collect()
    }

    stream_df = streaming_sessions(spark, src, schema=events.schema)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert set(got) == set(batch) and len(got) > 0
    for k, (n, tv) in batch.items():
        assert got[k][0] == n
        # same round6 rule both sides; tolerance covers sum-order ulps
        assert abs(got[k][1] - tv) <= 1e-6, k


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """Stream dedup parity: a corpus with injected duplicate event_ids
    fed through dropDuplicatesWithinWatermark (append sink) keeps
    exactly one row per key — the same KEY SET as batch dropDuplicates.
    (Which physical duplicate survives is arrival-order-dependent in
    both engines, so the invariant checked is the deduped key set +
    per-key row count, not row identity. All files land in ONE
    microbatch — with per-file batches the watermark from whichever
    part-file happens to be processed first could drop rows of the
    other, making the test a write-task-timing coin flip.)"""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.streaming.events import streaming_dedup

    events = load_table(spark, SF_SMOKE, "events").limit(500)
    # duplicate every 5th event (same event_id, same ts — a redelivery)
    dupes = events.filter(F.col("event_id") % 5 == 0)
    corpus = events.unionByName(dupes)
    src = str(tmp_path / "dedup_src")
    corpus.coalesce(2).write.parquet(src)

    batch_keys = {
        r.event_id
        for r in spark.read.parquet(src).dropDuplicates(["event_id"]).collect()
    }

    q = (
        streaming_dedup(spark, src, schema=events.schema)
        .writeStream.format("memory")
        .queryName("ev_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    rows = spark.sql("SELECT event_id FROM ev_dedup").collect()
    got = [r.event_id for r in rows]
    assert set(got) == batch_keys
    assert len(got) == len(set(got))  # every key exactly once


def test_streaming_edge_support_matches_batch(spark, tmp_path):
    """Continuous KG maintenance: the running edge-support state over
    a document file-stream equals the batch lead-window support table
    (the IVM auxiliary state of degrees_incremental) — adjacency is
    document-local, so the stream derives it statelessly per
    micro-batch and the state store holds one row per edge key."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from wikidata_qrank_spark.operators.linking import canonical_dictionary
    from wikidata_qrank_spark.operators.mentions import text_mentions
    from wikidata_qrank_spark.sources.interleaved import dictionary, redirects, spans
    from wikidata_qrank_spark.streaming.mentions import (
        streaming_docs,
        streaming_edge_support,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(150)
    src = str(tmp_path / "docs_src2")
    docs.coalesce(3).write.parquet(src)
    static_docs = spark.read.parquet(src)

    d = dictionary(static_docs)
    cdict = canonical_dictionary(d, redirects(d))
    m = text_mentions(spans(static_docs), cdict)
    w = Window.partitionBy("doc_id").orderBy("offset")
    batch = {
        (r.src_id, r.dst_id, r.support)
        for r in m.withColumn("__next", F.lead("item_id").over(w))
        .filter(F.col("__next").isNotNull() & (F.col("__next") != F.col("item_id")))
        .groupBy(
            F.col("item_id").alias("src_id"), F.col("__next").alias("dst_id")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .collect()
    }

    stream = streaming_docs(spark, src, schema=static_docs.schema)
    q = (
        streaming_edge_support(stream, cdict)
        .writeStream.format("memory")
        .queryName("edge_support_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.src_id, r.dst_id, r.support)
        for r in spark.sql("SELECT * FROM edge_support_stream").collect()
    }
    assert got == batch
