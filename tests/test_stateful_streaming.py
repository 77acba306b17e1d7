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
