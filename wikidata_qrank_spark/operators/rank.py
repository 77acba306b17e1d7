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
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rank",
    num_partitions: int | None = None,
    weight_col: str | None = None,
    cum_col: str | None = None,
) -> DataFrame:
    """Add a 1-based global rank by ``order_cols`` without a
    single-partition sort. ``order_cols`` are Column objects (may carry
    asc/desc).

    With ``weight_col``/``cum_col`` set, also add the GLOBAL running
    sum of ``weight_col`` in rank order (``cum_col``), through the same
    two-phase machinery: the per-partition prefix-sum dim carries a
    weight total next to the row count, so the running sum costs no
    extra exchange — this is the single home of the range-diamond
    pattern (see module docstring for why no persist is needed), reused
    by qrank's global rank and textstats' vocabulary-coverage curve."""
    if (weight_col is None) != (cum_col is None):
        raise ValueError("weight_col and cum_col must be set together")
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("__s"))
    sizes = ranged.groupBy("__pid").agg(*aggs)
    # exclusive prefix sum over ≤ `parts` rows: tiny non-equi self-join
    # (empty partitions are simply absent and contribute 0)
    offs = [F.coalesce(F.sum("b.__n"), F.lit(0)).cast("long").alias("__offset")]
    if weight_col is not None:
        offs.append(
            F.coalesce(F.sum("b.__s"), F.lit(0)).cast("long").alias("__soffset")
        )
    offsets = (
        sizes.alias("a")
        .join(F.broadcast(sizes.alias("b")), F.col("b.__pid") < F.col("a.__pid"), "left")
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(*offs)
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = (
        ranged.withColumn("__local", F.row_number().over(w))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__local") + F.col("__offset")).cast("long"))
    )
    if weight_col is not None:
        wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = out.withColumn(
            cum_col,
            (F.sum(weight_col).over(wsum) + F.col("__soffset")).cast("long"),
        ).drop("__soffset")
    return out.drop("__pid", "__local", "__offset")
