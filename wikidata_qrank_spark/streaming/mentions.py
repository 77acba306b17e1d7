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
