"""Interleaved-document model (BASELINE.json input_hint).

The engine's primary input is an Iceberg/parquet table of interleaved
text + media documents::

    docs(doc_id: string,
         spans: array<struct<kind:string, text:string,
                             media_ref:string, offset:int>>)

The sandbox corpus ships plain ``documents.parquet`` (doc_id, text, …),
so this module *derives* the interleaved shape deterministically — the
same rule is mirrored in ANSI SQL by ``oracles.py`` so DuckDB can verify
every downstream operator. Derivation rule (fixed, seedless):

* tokenize ``text`` on single spaces; 0-based position ``offset``
* positions with ``offset % 7 == 3`` become ``media`` spans with
  ``media_ref = 'File:<token>.jpg'`` (the Commons-file analog); all
  others are ``text`` spans carrying the token
* the title→QID dictionary ("sitelinks", entities.go:393) is the
  distinct token vocabulary with ``length >= 3``; the numeric item id is
  ``1 + ((rank-1) % (1 + 4*|V| div 5))`` over the alphabetical rank, so
  ~20% of titles are many-to-one aliases of the same entity, mirroring
  multiple wiki titles per QID
* redirects (titles.go:394-400): items whose id ends in 7, 8 or 9
  redirect to ``id-1`` — chains 9→8→7→6 exercise iterative
  redirect-chain canonicalization (pagelinks.go:210-311 semantics)

Scale notes: the vocabulary/dictionary is tiny relative to the corpus
(exactly like real sitelinks vs pageview logs), but the alphabetical
rank over it still uses the two-phase ``global_row_number`` (range
shuffle + local row_number + broadcast offsets) rather than an
unpartitioned window — the derivation path has NO single-task stage,
so it holds even if a deployment derives its dictionary from a
corpus-sized vocabulary. The corpus-side tokenize/explode is
embarrassingly parallel and never shuffles until the mention join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rank import global_row_number

# fraction of the offset cycle that is media spans: offset % MEDIA_MOD == MEDIA_PHASE
MEDIA_MOD = 7
MEDIA_PHASE = 3
MIN_TITLE_LEN = 3


def spans(documents: DataFrame) -> DataFrame:
    """Exploded span view: (doc_id, offset, kind, text, media_ref).

    This is the processing-friendly shape; ``docs_with_spans`` packs it
    back into the input_hint nested schema. posexplode keeps the scan
    pipeline inside whole-stage codegen — no Python in the tokenize path.
    """
    tok = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.posexplode(F.split(F.col("text"), " ")).alias("offset", "token"),
    )
    is_media = (F.col("offset") % MEDIA_MOD) == MEDIA_PHASE
    return tok.select(
        "doc_id",
        F.col("offset").cast("int").alias("offset"),
        F.when(is_media, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
        F.when(~is_media, F.col("token")).alias("text"),
        F.when(is_media, F.concat(F.lit("File:"), F.col("token"), F.lit(".jpg"))).alias(
            "media_ref"
        ),
    )


def docs_with_spans(documents: DataFrame) -> DataFrame:
    """Nested input_hint shape: (doc_id, spans array sorted by offset).

    ``array_sort`` on the struct with ``offset`` leading guarantees the
    span-sequence invariant (kind, text, media_ref, order) regardless of
    shuffle order.
    """
    s = spans(documents)
    packed = s.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
        ).alias("spans_by_offset")
    )
    return packed.select(
        "doc_id",
        F.transform(
            F.col("spans_by_offset"),
            lambda x: F.struct(
                x["kind"].alias("kind"),
                x["text"].alias("text"),
                x["media_ref"].alias("media_ref"),
                x["offset"].alias("offset"),
            ),
        ).alias("spans"),
    )


def dictionary(documents: DataFrame) -> DataFrame:
    """Title→entity dictionary (the broadcast sitelinks analog).

    Returns (title, item_id, item). Tiny by construction — always
    broadcast it into the mention join.
    """
    vocab = (
        documents.select(F.explode(F.split(F.col("text"), " ")).alias("title"))
        .filter(F.length("title") >= MIN_TITLE_LEN)
        .distinct()
    )
    total = vocab.agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    ranked = global_row_number(
        vocab, [F.col("title").asc()], rank_col="rn"
    ).crossJoin(F.broadcast(total))
    return ranked.select(
        "title",
        (1 + (F.col("rn") - 1) % (1 + F.expr("cnt * 4 div 5"))).cast("long").alias(
            "item_id"
        ),
    ).withColumn("item", F.concat(F.lit("Q"), F.col("item_id")))


def redirects(dict_df: DataFrame) -> DataFrame:
    """Redirect edges (alias_id → target_id): ids ending in 7/8/9 point
    at id-1; 9→8→7→6 forms a chain resolved iteratively by the linker."""
    ids = dict_df.select("item_id").distinct()
    return (
        ids.filter(F.col("item_id") % 10 >= 7)
        .select(
            F.col("item_id").alias("alias_id"),
            (F.col("item_id") - 1).cast("long").alias("target_id"),
        )
    )


def spans_from_interleaved(docs_nested: DataFrame) -> DataFrame:
    """Exploded span view from a REAL interleaved table of the
    input_hint shape (doc_id, spans array<struct<kind,text,media_ref,
    offset>>) — the inverse of ``docs_with_spans``. The engine's
    operators consume this exploded form, so a deployment whose corpus
    is already interleaved plugs in here and skips the derivation."""
    return docs_nested.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )
