"""Bucketed checkpoints — persist a partitioning across stages.

The reference's core physical trick is co-sorted files: every stage
writes sorted output so the next stage merge-joins without re-sorting
(doc/design.md:84-94, SURVEY O-1). The Spark-native persistent form is a
**bucketed + sorted table**: `bucketBy(n, key).sortBy(key)` at write
time records the hash-clustering in the catalog, so downstream
aggregations, joins and windows keyed on `key` skip the exchange
entirely — the checkpoint pays the shuffle once and every consumer
reuses it. At 100 TB this converts the per-consumer corpus shuffle of
mention-stream windows (triples) and per-doc aggregations into map-only
stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def checkpoint_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Write ``df`` as a bucketed (and optionally sorted) managed table,
    read it back. Consumers keyed on ``bucket_cols`` get exchange-free
    plans."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a stale location without a catalog entry (e.g. from a previous
    # session with an in-memory catalog) blocks CREATE — remove it
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table_name.lower()}", ignore_errors=True)

    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    return df.sparkSession.table(table_name)


def has_exchange_on(df: DataFrame, key: str) -> bool:
    """Plan probe used by tests: does the physical plan shuffle on
    ``key``, or is the source clustering reused? (Other exchanges — e.g.
    a downstream dedup on different keys — are ignored.)"""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        line.strip().lstrip("+-: *").startswith("Exchange hashpartitioning(" + key)
        for line in plan.splitlines()
    )
