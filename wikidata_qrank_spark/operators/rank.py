"""Scalable global ranking.

The reference's final rank is a position in a globally sorted file
(qrank.go:55-146, external merge sort). The naive Spark translation —
``row_number().over(Window.orderBy(...))`` — collapses to ONE task and
dies at scale. This module implements the two-phase pattern:

1. ``repartitionByRange`` on the sort keys (range shuffle, parallel),
2. per-partition sort + local row_number,
3. cumulative partition-size offsets added back via a broadcast join.

Equivalent result, fully parallel — the same trick the reference's
external sort + sequential writer achieves on one machine.

The offsets are computed INSIDE the same query as the ranked output
(a diamond over the range exchange, deduplicated by Spark's
ReusedExchange rule), not by a separate driver-side ``collect`` job:

* no ``persist`` is needed to freeze the range boundaries — both
  consumers read the one exchange, so boundaries are sampled once
  (and nothing leaks in the block manager across repeated calls);
* the per-partition offset prefix-sum is a broadcast of a
  #partitions-row self-join, not an unpartitioned window — no
  single-task stage anywhere in the plan.

AQE note: ``repartitionByRange`` with an explicit partition count is
user-specified, so AQE will not re-coalesce it differently for the two
branches of the diamond — ``spark_partition_id()`` is consistent.
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
    sizes = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    # exclusive prefix sum over ≤ `parts` rows: tiny non-equi self-join
    # (empty partitions are simply absent and contribute 0)
    offsets = (
        sizes.alias("a")
        .join(F.broadcast(sizes.alias("b")), F.col("b.__pid") < F.col("a.__pid"), "left")
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(F.coalesce(F.sum("b.__n"), F.lit(0)).cast("long").alias("__offset"))
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.withColumn("__local", F.row_number().over(w))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__local") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local", "__offset")
    )
