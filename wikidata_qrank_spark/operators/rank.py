"""Scalable global ranking.

The reference's final rank is a position in a globally sorted file
(qrank.go:55-146, external merge sort). The naive Spark translation —
``row_number().over(Window.orderBy(...))`` — collapses to ONE task and
dies at scale. This module implements the two-phase pattern:

1. ``repartitionByRange`` on the sort keys (range shuffle, parallel),
2. per-partition sort + local row_number,
3. cumulative partition-size offsets (tiny driver-side prefix sum,
   one row per partition) broadcast back and added.

Equivalent result, fully parallel — the same trick the reference's
external sort + sequential writer achieves on one machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, order_cols: list, rank_col: str = "rank", num_partitions: int | None = None
) -> DataFrame:
    """Add a 1-based global rank by ``order_cols`` without a
    single-partition sort. ``order_cols`` are Column objects (may carry
    asc/desc)."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.persist()
    sizes = ranged.groupBy("__pid").count().collect()
    offsets = {}
    running = 0
    for row in sorted(sizes, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = running
        running += row["count"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = (
        ranged.withColumn("__local", F.row_number().over(w))
        .join(F.broadcast(off_df), "__pid")
        .withColumn(rank_col, (F.col("__local") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local", "__offset")
    )
    return out
