"""Stateful streaming dedup: first-seen across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_qrank_spark.streaming.stateful import first_seen_dedup


def test_first_seen_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # two files → two micro-batches (maxFilesPerTrigger=1); user 1 and 2
    # recur across batches, user 3 only in batch 2
    b1 = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], "user_id long, event_id long"
    )
    b2 = spark.createDataFrame(
        [(1, 12), (2, 21), (3, 30)], "user_id long, event_id long"
    )
    import time

    b1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mod-times → deterministic batch order
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id long, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = first_seen_dedup(
        stream.groupBy("user_id"),
        output_schema="user_id long, event_id long",
        value_cols=["event_id"],
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r.user_id: r.event_id for r in spark.sql("SELECT * FROM dedup_out").collect()
    }
    # each key exactly once, first occurrence kept (min event_id of its
    # first batch)
    assert rows == {1: 10, 2: 20, 3: 30}


def test_latest_state_matches_batch_compaction(spark, tmp_path):
    """Streaming changelog compaction: after consuming all batches, the
    final emitted state per key equals compact_changelog on the union —
    including a LATE older row in batch 2 that must not displace newer
    state."""
    import time

    from wikidata_qrank_spark.operators.compaction import compact_changelog
    from wikidata_qrank_spark.streaming.stateful import latest_state

    src = str(tmp_path / "ls_src")
    schema = "user_id long, ts long, change_id long, payload string"
    b1 = spark.createDataFrame(
        [(1, 100, 1, "a"), (1, 200, 2, "b"), (2, 50, 3, "x")], schema
    )
    # user 1 gets a LATE row (ts 150 < current 200); user 2 advances
    b2 = spark.createDataFrame(
        [(1, 150, 4, "late"), (2, 60, 5, "y"), (3, 10, 6, "new")], schema
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = latest_state(
        stream.groupBy("user_id"),
        output_schema=schema,
        ts_col="ts",
        tiebreak_col="change_id",
        value_cols=["payload"],
    )
    q = (
        out.writeStream.format("memory")
        .queryName("latest_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM latest_out").collect()
    final = {}
    for r in rows:  # memory sink appends every update; last wins per key
        cur = final.get(r.user_id)
        if cur is None or (r.ts, r.change_id) > (cur.ts, cur.change_id):
            final[r.user_id] = r
    got = {k: (r.ts, r.change_id, r.payload) for k, r in final.items()}

    batch = compact_changelog(
        b1.unionByName(b2), key_cols=["user_id"], ts_col="ts", tiebreak_col="change_id"
    )
    want = {r.user_id: (r.ts, r.change_id, r.payload) for r in batch.collect()}
    assert got == want
    # the late row must never have been emitted for user 1
    assert all(not (r.user_id == 1 and r.payload == "late") for r in rows)
