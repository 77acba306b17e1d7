"""Triple materialization: the entity link graph.

Reference semantics: the links dataset `Q<src>,Q<dst>` — sorted, deduped,
self-loops removed (links.go:15-18,60-77; goldens pagelinks_test.go:67-73).
Here edges arise from *adjacent entity mentions within a document* (the
document-level analog of a wiki page linking to another page), giving
(subj, pred, obj) triples with pred = 'links_to'.

Dedup reproduces the reference's external-merge-sort + consecutive-dup
drop as ``repartitionByRange + sortWithinPartitions + dropDuplicates`` —
the north rule names exactly this physical shape. dropDuplicates before
the range partition would shuffle twice; after it, AQE sees the data
already hash-clustered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRED_LINKS_TO = "links_to"


def triples(mentions_df: DataFrame) -> DataFrame:
    """(subj, pred, obj) from consecutive mentions per document.

    The lead() window partitions by doc_id — documents are independent,
    so this shuffles once on doc_id and parallelizes per-document.
    Self-loops dropped, duplicates dropped (U2 semantics).
    """
    w = Window.partitionBy("doc_id").orderBy("offset")
    edges = (
        mentions_df.withColumn("__next", F.lead("item_id").over(w))
        .filter(F.col("__next").isNotNull() & (F.col("__next") != F.col("item_id")))
        .select(
            F.col("item_id").alias("src_id"),
            F.col("__next").alias("dst_id"),
        )
    )
    deduped = edges.dropDuplicates(["src_id", "dst_id"])
    return deduped.select(
        F.concat(F.lit("Q"), F.col("src_id")).alias("subj"),
        F.lit(PRED_LINKS_TO).alias("pred"),
        F.concat(F.lit("Q"), F.col("dst_id")).alias("obj"),
        F.col("src_id"),
        F.col("dst_id"),
    )


def write_triples(triples_df: DataFrame, path: str, num_partitions: int = 32) -> None:
    """Persist sorted like the reference's links files: range-partitioned
    by (src, dst), sorted within partitions — globally ordered output
    across files without a single-task sort."""
    (
        triples_df.repartitionByRange(num_partitions, "src_id", "dst_id")
        .sortWithinPartitions("src_id", "dst_id")
        .select("subj", "pred", "obj")
        .write.mode("overwrite")
        .parquet(path)
    )
