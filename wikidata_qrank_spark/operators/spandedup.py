"""Exact n-gram span deduplication (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better" — the ExactSubstr
setting): find every maximal token span that is part of an n-gram
occurring in ≥ ``min_docs`` distinct documents, so the caller can
scrub duplicated boilerplate from training text rather than dropping
whole documents.

The paper's suffix-array algorithm is single-machine; the Spark-first
equivalent is:

1. position-tokenize (posexplode — no text shuffle after this point;
   only (doc_id, offset, 16-byte hash) rows move);
2. per-position n-gram via ``lead`` over the per-document window
   (bounded by document length, never corpus-wide);
3. keyed aggregation on the gram hash with map-side partials to find
   hashes spanning ≥ min_docs documents, then a semi-join of positions
   against that set (hot boilerplate grams are exactly the AQE
   skew-join case);
4. classic island merge of the [offset, offset+n) intervals per
   document: running ``max(end)`` over preceding rows → new-island
   flag → prefix-sum island id → groupBy island. All window work is
   per-document.

Every value is an integer or an md5 hex string, so the DuckDB oracle
replays the relation exactly.

Reference parity: the reference pipeline (qrank-builder) has no
corpus-dedup stage; this is a training-data extension alongside
operators/dedup.py's document-level minhash/simhash family — it
catches PARTIAL overlap those document-granularity sketches miss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def duplicated_spans(
    documents: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens) — per document, the
    merged maximal [start, end) token intervals covered by at least one
    n-gram that appears in >= min_docs distinct documents. Offsets are
    whitespace-token positions; end is exclusive."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")

    tok = documents.select(
        F.col(doc_id).cast("string").alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("offset", "token"),
    )
    w = Window.partitionBy("doc_id").orderBy("offset")
    # the lead window exprs MUST be projected before the boundary
    # filter — a lead computed after the filter would skip tokens
    gram_cols = [F.col("token")] + [F.lead("token", i).over(w) for i in range(1, n)]
    grams = (
        tok.select(
            "doc_id",
            "offset",
            F.lead("token", n - 1).over(w).alias("__last"),
            F.md5(F.concat_ws(" ", *gram_cols)).alias("__h"),
        )
        .filter(F.col("__last").isNotNull())
        .select("doc_id", "offset", "__h")
        # grams feeds both the dup-hash aggregation and the position
        # semi-join; materialize the (doc_id, offset, 16-byte-hash)
        # relation (the compact one — text never re-enters) instead of
        # re-tokenizing the corpus per branch. localCheckpoint, not
        # persist: no CacheManager pin across calls (round-5 ADVICE)
        .localCheckpoint(eager=True)
    )
    dup = (
        grams.groupBy("__h")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__h")
    )
    pos = grams.join(dup, "__h", "left_semi").select("doc_id", "offset")

    prev_max = F.max(F.col("offset") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        pos.withColumn(
            "__new",
            F.when(
                prev_max.isNull() | (F.col("offset") > prev_max), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn("__island", F.sum("__new").over(w))
    )
    return (
        islands.groupBy("doc_id", "__island")
        .agg(
            F.min("offset").cast("long").alias("span_start"),
            (F.max("offset") + n).cast("long").alias("span_end"),
        )
        .withColumn(
            "span_tokens", (F.col("span_end") - F.col("span_start")).cast("long")
        )
        .drop("__island")
    )
