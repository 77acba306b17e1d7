"""Output sinks matching the reference's published formats (K1/K2/K3).

The reference publishes compressed, globally-sorted files; the Spark
equivalents preserve the ordering contract:

* ``write_sorted_parquet`` — range-partition + sort-within-partitions:
  globally ordered across files without a single-task sort (the default
  engine output; O1 semantics).
* ``write_qrank_csv`` — the public `Entity,QRank` CSV (qrank.go:106-122),
  gzip, ordered desc rank / asc entity. The reference emits ONE file;
  at 27M rows a coalesce(1) stream-through is acceptable and matches
  the contract; pass single_file=False to keep ordered shards.
* ``write_item_signals_csv`` — item_signals header + row format
  (item_signals_writer.go:52-83).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_sorted_parquet(
    df: DataFrame, path: str, order_cols: list[str], num_partitions: int = 32
) -> None:
    (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_qrank_csv(qrank_df: DataFrame, path: str, single_file: bool = True) -> None:
    """qrank_df: (item, views, rank). CSV columns Entity,QRank, ordered
    by rank ascending (i.e. views desc, entity-id asc tiebreak)."""
    out = qrank_df.select(
        F.col("item").alias("Entity"), F.col("views").alias("QRank"), "rank"
    )
    if single_file:
        out = out.orderBy("rank").coalesce(1)
    else:
        out = out.repartitionByRange(32, "rank").sortWithinPartitions("rank")
    (
        out.drop("rank")
        .write.mode("overwrite")
        .option("header", True)
        .option("compression", "gzip")
        .csv(path)
    )


def write_item_signals_csv(signals_df: DataFrame, path: str) -> None:
    """signals_df: item_signals schema; ordered by numeric item id
    ascending like the reference writer (itemsignals.go:96-136)."""
    (
        signals_df.orderBy("item_id")
        .select(
            "item", "pageviews_52w", "wikitext_bytes", "claims", "identifiers", "sitelinks"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("compression", "gzip")
        .csv(path)
    )
