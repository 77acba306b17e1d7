"""Streaming KG ingestion: incremental mention counting.

The batch pipeline's qviews (salted sum of per-entity mentions) has a
natural streaming twin: documents arrive as files (the daily-dump drop
the reference polls for), the mention join is a STREAM-STATIC broadcast
join against the canonical dictionary (no state — the dictionary is a
static dimension), and the per-entity counts are a streaming
aggregation whose state store IS the running qviews table. Batch/stream
parity is asserted in tests (same rows as operators.qrank.qviews).

At scale this is the "keep qrank fresh between dumps" mode: each
micro-batch shuffles only its own mentions; state is one row per
entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mentions import text_mentions
from ..sources.interleaved import spans


def streaming_docs(spark: SparkSession, parquet_dir: str, schema) -> DataFrame:
    """File-source document stream (one file per micro-batch — the
    dump-drop cadence)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_dir)
    )


def streaming_qviews(doc_stream: DataFrame, dict_df: DataFrame) -> DataFrame:
    """Running (item_id, views) over a document stream.

    ``spans`` + ``text_mentions`` are stateless narrow/broadcast ops, so
    they apply to the stream unchanged — the same code path as batch.
    The groupBy is the only stateful operator (complete-mode output).
    """
    mentions = text_mentions(spans(doc_stream), dict_df)
    return mentions.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("long").alias("views")
    )


def streaming_edge_support(
    doc_stream: DataFrame, dict_df: DataFrame
) -> DataFrame:
    """Running (src_id, dst_id, support) over a document stream — the
    continuous-KG-maintenance twin of
    plans.incremental_kg.degrees_incremental: consecutive-mention
    edges are DOCUMENT-LOCAL, so each micro-batch derives its pair
    instances STATELESSLY inside the doc-local Arrow kernel (the
    triples_arrow adjacency rule, duplicates kept — support counts
    multiplicity), and the running support table is the ONLY stateful
    operator (one row per edge key, additive merge — the IVM auxiliary
    state, maintained by the engine's state store instead of an
    explicit full-outer merge). Degrees/triples are a stateless view
    over it (keys with support ≥ 1).

    Streaming-legal by construction: no window/lead over the stream
    and no chained stateful aggregations (a per-doc groupBy before the
    edge groupBy trips Spark's global-watermark correctness check);
    the kernel is a pure map. The dictionary is a collected broadcast
    dimension guarded by collect_dictionary's size ceiling — past it,
    continuous mode needs the batch incremental path
    (degrees_incremental per dump drop)."""
    from typing import Iterator

    import pandas as pd

    from ..operators.mentions import collect_dictionary
    from ..sources.interleaved import MEDIA_MOD, MEDIA_PHASE

    spark = doc_stream.sparkSession
    table = collect_dictionary(dict_df)  # default size ceiling applies
    bc = spark.sparkContext.broadcast(table)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lookup = bc.value
        for pdf in batches:
            srcs: list[int] = []
            dsts: list[int] = []
            for text in pdf["text"]:
                prev = None
                for pos, tok in enumerate(text.split(" ")):
                    if pos % MEDIA_MOD == MEDIA_PHASE:
                        continue
                    item = lookup.get(tok)
                    if item is None:
                        continue
                    if prev is not None and prev != item:
                        srcs.append(prev)
                        dsts.append(item)
                    prev = item
            yield pd.DataFrame(
                {"src_id": pd.Series(srcs, dtype="int64"),
                 "dst_id": pd.Series(dsts, dtype="int64")}
            )

    pairs = doc_stream.select("text").mapInPandas(
        kernel, schema="src_id long, dst_id long"
    )
    return pairs.groupBy("src_id", "dst_id").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
