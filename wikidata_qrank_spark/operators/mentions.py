"""Mention detection: span surface forms → candidate entity ids.

Reference semantics: the qviews join (qviews.go:163-213) — page keys from
pageview logs matched against the sitelinks dictionary; unmatched keys
are dropped (inner join). The dictionary is small relative to the corpus
(76.7M sitelinks vs billions of log lines — doc/design.md:65-82), so the
Spark-first physical plan is a **broadcast hash join**: no shuffle of the
corpus side at all. At 100 TB this is the difference between a map-only
stage and a petabyte shuffle.

Two implementations, equal by construction (tested):

* ``text_mentions`` — pure JVM broadcast join (default hot path;
  whole-stage codegen end to end).
* ``text_mentions_arrow`` — Arrow-batched ``mapInPandas`` kernel doing
  batched dictionary matching against a broadcast Python dict (the
  north-star's "vectorized pandas UDF mention detection"; the extension
  point where a real NER/EL model would slot in).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MENTION_SCHEMA = "doc_id string, offset int, item_id long"

# Guard for driver-side dictionary materialization. The production
# sitelinks table is 76.7M rows / 783 MB (doc/design.md:77-82) — about
# the ceiling a driver-held Python dict can take; past it the Arrow
# kernels must not silently OOM the driver.
DEFAULT_MAX_DICT_ROWS = 50_000_000


class DictionaryTooLargeError(RuntimeError):
    """The title→item dictionary is too large to collect onto the driver
    for a Python-broadcast Arrow kernel; use the JVM broadcast-join
    operators (text_mentions / media_mentions / links.triples) instead."""


def collect_dictionary(
    dict_df: DataFrame, max_rows: int | None = DEFAULT_MAX_DICT_ROWS
) -> dict:
    """(title → item_id) as a driver-side dict for Arrow kernels.

    Counts the (aggregated, usually persisted) dimension first — one
    cheap job — and refuses past ``max_rows`` instead of OOMing the
    driver at real-sitelinks scale. ``max_rows=None`` skips the guard.
    """
    if max_rows is not None:
        n = dict_df.count()
        if n > max_rows:
            raise DictionaryTooLargeError(
                f"dictionary has {n} rows > max_rows={max_rows}; "
                "use the JVM broadcast-join path"
            )
    return {
        r["title"]: r["item_id"] for r in dict_df.select("title", "item_id").collect()
    }


def text_mentions(spans_df: DataFrame, dict_df: DataFrame) -> DataFrame:
    """(doc_id, offset, item_id) for every text span whose surface form
    is a dictionary title. Inner join: non-entity tokens drop out, same
    as unmatched page keys in the reference join."""
    surface = spans_df.filter(F.col("kind") == "text").select(
        "doc_id", "offset", F.col("text").alias("title")
    )
    return surface.join(F.broadcast(dict_df.select("title", "item_id")), "title").select(
        "doc_id", "offset", "item_id"
    )


def media_mentions(spans_df: DataFrame, dict_df: DataFrame) -> DataFrame:
    """Media spans resolved through their file reference: the token
    inside 'File:<token>.jpg' is looked up in the same dictionary (the
    Commons-file ↔ entity analog)."""
    surface = spans_df.filter(F.col("kind") == "media").select(
        "doc_id",
        "offset",
        F.expr("substring(media_ref, 6, length(media_ref) - 9)").alias("title"),
    )
    return surface.join(F.broadcast(dict_df.select("title", "item_id")), "title").select(
        "doc_id", "offset", "item_id"
    )


def text_mentions_arrow(
    spans_df: DataFrame,
    dict_df: DataFrame,
    max_dict_rows: int | None = DEFAULT_MAX_DICT_ROWS,
) -> DataFrame:
    """Arrow-batched variant: dictionary broadcast as a plain dict to the
    Python workers; matching is a vectorized pandas ``map`` per batch.

    The dictionary is collected on the driver — valid for the same reason
    the broadcast join is: the dictionary side is small by construction.
    Past ``max_dict_rows`` this falls back to the JVM broadcast join
    (``text_mentions``), which produces the identical relation without
    holding the dictionary in driver memory.
    """
    spark = spans_df.sparkSession
    try:
        pairs = collect_dictionary(dict_df, max_dict_rows)
    except DictionaryTooLargeError:
        return text_mentions(spans_df, dict_df)
    bc = spark.sparkContext.broadcast(pairs)

    def match_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = bc.value
        for pdf in batches:
            sub = pdf[pdf["kind"] == "text"]
            hit = sub["text"].map(table)
            keep = hit.notna()
            yield pd.DataFrame(
                {
                    "doc_id": sub.loc[keep, "doc_id"],
                    "offset": sub.loc[keep, "offset"].astype("int32"),
                    "item_id": hit[keep].astype("int64"),
                }
            )

    cols = spans_df.select("doc_id", "offset", "kind", "text")
    return cols.mapInPandas(match_batches, schema=MENTION_SCHEMA)
