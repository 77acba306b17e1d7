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


def triples_arrow(
    documents: DataFrame,
    dict_df: DataFrame,
    max_dict_rows: int | None = None,
) -> DataFrame:
    """Shuffle-free triple extraction: adjacency is *document-local*, so
    the consecutive-mention pairs are computed inside an Arrow batch
    kernel per document row — the corpus is never shuffled. Only the
    already-deduped-per-task pair stream reaches the exchange, where
    dropDuplicates' map-side partial aggregation reduces it to the edge
    set (|E| ≪ corpus).

    This is the scale path; ``triples`` (lead-window form) is the
    all-built-ins equivalent — they produce identical edge sets (tested
    + same oracle). At 10^12 docs the window form shuffles the whole
    mention stream on doc_id; this form shuffles ~|E| rows.

    Matches the span derivation of sources.interleaved: positions with
    offset % MEDIA_MOD == MEDIA_PHASE are media spans and do not join
    the text-mention adjacency chain, exactly like spans()+text_mentions.

    The driver-collected dictionary is guarded by ``max_dict_rows``
    (default: the production-sitelinks ceiling); past it this falls back
    to the equivalent all-built-ins plan — spans → JVM broadcast mention
    join → lead-window ``triples`` — which never holds the dictionary in
    Python memory.
    """
    from typing import Iterator

    import pandas as pd

    from ..sources.interleaved import MEDIA_MOD, MEDIA_PHASE
    from .mentions import (
        DEFAULT_MAX_DICT_ROWS,
        DictionaryTooLargeError,
        collect_dictionary,
        text_mentions,
    )

    spark = documents.sparkSession
    try:
        table = collect_dictionary(
            dict_df, DEFAULT_MAX_DICT_ROWS if max_dict_rows is None else max_dict_rows
        )
    except DictionaryTooLargeError:
        from ..sources.interleaved import spans as _spans

        return triples(text_mentions(_spans(documents), dict_df))
    bc = spark.sparkContext.broadcast(table)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lookup = bc.value
        for pdf in batches:
            srcs: list[int] = []
            dsts: list[int] = []
            seen: set[tuple[int, int]] = set()
            for text in pdf["text"]:
                prev = None
                for pos, tok in enumerate(text.split(" ")):
                    if pos % MEDIA_MOD == MEDIA_PHASE:
                        continue
                    item = lookup.get(tok)
                    if item is None:
                        continue
                    if prev is not None and prev != item:
                        edge = (prev, item)
                        if edge not in seen:
                            seen.add(edge)
                            srcs.append(prev)
                            dsts.append(item)
                    prev = item
            yield pd.DataFrame({"src_id": pd.Series(srcs, dtype="int64"),
                                "dst_id": pd.Series(dsts, dtype="int64")})

    edges = documents.select("text").mapInPandas(kernel, schema="src_id long, dst_id long")
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


def triple_provenance(mentions_df: DataFrame, sample_k: int = 5) -> DataFrame:
    """(src_id, dst_id, n_docs, sample_docs) — per-triple provenance:
    how many distinct documents support each consecutive-mention edge,
    plus the first ``sample_k`` supporting doc ids BY THE ID COLUMN'S
    NATURAL ORDERING as a comma-joined string (deterministic evidence
    pointers — the audit trail a KG reviewer follows from a triple
    back to text; the reference materializes edges with no provenance
    at all). The mention pipeline carries doc_id as a string, so the
    sample ranks lexicographically ('10' < '2') — consistent across
    engines (the oracle casts identically); cast upstream if numeric
    ordering is wanted.

    Bounded state by construction: a naive collect_set(doc_id) per
    edge holds EVERY supporting doc of a hot edge in one aggregation
    buffer — unbounded on a popular entity pair. Here a per-edge
    row_number window ranks supporting docs (edge-keyed shuffle),
    only ranks ≤ sample_k enter the list aggregate, so per-edge state
    is ≤ sample_k ids no matter how popular the edge; the count is a
    plain long. Output is a string, not an array — gate-stable for
    hash comparison."""
    from pyspark.sql import Window

    if sample_k < 1:
        raise ValueError(f"sample_k must be >= 1, got {sample_k}")
    w = Window.partitionBy("doc_id").orderBy("offset")
    occ = (
        mentions_df.withColumn("__next", F.lead("item_id").over(w))
        .filter(
            F.col("__next").isNotNull() & (F.col("__next") != F.col("item_id"))
        )
        .select(
            "doc_id",
            F.col("item_id").alias("src_id"),
            F.col("__next").alias("dst_id"),
        )
        .distinct()
    )
    we = Window.partitionBy("src_id", "dst_id").orderBy("doc_id")
    ranked = occ.withColumn("__rn", F.row_number().over(we))
    return ranked.groupBy("src_id", "dst_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__rn") <= sample_k, F.col("doc_id"))
                    )
                ),
                lambda x: x.cast("string"),
            ),
        ).alias("sample_docs"),
    )


def windowed_cooccurrence(
    mentions_df: DataFrame, window: int = 3
) -> DataFrame:
    """(src_id, dst_id, n_cooc, weight_micro) — soft relation
    extraction: directed entity co-occurrences within a ``window`` of
    mention POSITIONS per document (not just adjacent, the triples()
    rule), each weighted by inverse rank distance — weight contribution
    floor(1e6 / d) for distance d, summed as exact BIGINTs so closer
    co-mentions dominate and the fold is order-free. The standard
    distant-supervision signal a relation-extraction trainer consumes
    where adjacency alone is too sparse.

    Same fan-out discipline as textstats.skipgram_pairs: each mention
    explodes its ≤window forward offsets map-side (a broadcast literal
    dim) and equi-joins on (doc_id, rank + d) — bounded at window rows
    per mention, never a positions² band join; the per-doc rank is one
    doc-keyed window (the shape the triple derivation already pays).
    Self-pairs (same entity both sides) are dropped like triples()."""
    from pyspark.sql import Window

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = Window.partitionBy("doc_id").orderBy("offset")
    # ranked feeds BOTH join sides — eager truncation runs the mention
    # pipeline + rank window once (compact id/rank projection, no text)
    ranked = mentions_df.select(
        "doc_id", "item_id", F.row_number().over(w).cast("long").alias("rn")
    ).localCheckpoint(eager=True)
    spark = mentions_df.sparkSession
    offs = spark.createDataFrame([(d,) for d in range(1, window + 1)], "d long")
    left = ranked.crossJoin(F.broadcast(offs)).select(
        "doc_id",
        F.col("item_id").alias("src_id"),
        (F.col("rn") + F.col("d")).alias("rn"),
        "d",
    )
    right = ranked.select("doc_id", "rn", F.col("item_id").alias("dst_id"))
    contrib = F.floor(1000000.0 / F.col("d").cast("double") + 0.5).cast("long")
    return (
        left.join(right, ["doc_id", "rn"])
        .filter(F.col("src_id") != F.col("dst_id"))
        .groupBy("src_id", "dst_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cooc"),
            F.sum(contrib).alias("weight_micro"),
        )
    )
