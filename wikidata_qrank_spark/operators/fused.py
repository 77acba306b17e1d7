"""Fused Arrow build kernel — the 100 TB scale path.

One vectorized pass over the document text computes, per Arrow batch:

* per-entity mention-count partials (the map side of qviews A4 — the
  kernel IS phase one of the two-phase aggregation, so no salt is
  needed downstream: reduce-side rows ≤ batches × |entities|), and
* the distinct entity-adjacency edges of the batch (triples, U2
  semantics applied per batch, finished by a global distinct).

Why fused: the all-built-ins pipeline (spans → explode → broadcast
join → window) re-materializes the token stream several times —
measured memory-bandwidth-bound on local hardware and shuffle-bound at
cluster scale (the window form shuffles every mention on doc_id). Doc
adjacency is row-local, so a single text pass suffices; only
kilobyte-scale partials reach the exchange. This is exactly the
north-star shape: "vectorized Arrow/pandas UDFs perform batched mention
detection against a broadcast title→QID dictionary".

Equality with the unfused operators (mentions+qviews, triples) is
asserted in tests/test_fused.py; both forms share the same DuckDB
oracles.
"""

from __future__ import annotations

from itertools import chain
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.interleaved import MEDIA_MOD, MEDIA_PHASE
from .links import PRED_LINKS_TO

PARTIALS_SCHEMA = "tag string, a long, b long, n long"


def kg_partials(
    documents: DataFrame,
    dict_df: DataFrame,
    text_col: str = "text",
    max_dict_rows: int | None = None,
    signals: bool = False,
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-batch partials: ('v', item_id, 0, count) view partials and
    ('e', src_id, dst_id, 1) edge candidates. Text is read exactly once;
    output is O(|entities| + |edges|) per batch, independent of batch
    row count.

    ``signals=True`` additionally emits the item_signals partials in the
    SAME pass — valid because each document lives entirely inside one
    Arrow batch, so per-(item, doc) statistics complete within the
    batch and reduce to per-item sums before the exchange:

    * ('w', item, 0, Σ chars of batch docs mentioning item) → wikitext_bytes
    * ('c', item, 0, #batch docs mentioning item)           → claims
    * ('m', item, 0, #media mentions in batch)              → sitelinks

    With these, the ENTIRE reference output set (qviews, qrank, triples,
    item_signals) derives from ONE corpus read + one KB-scale combining
    shuffle (see ``item_signals_from_combined``).

    The dictionary is driver-collected (guarded by ``max_dict_rows``,
    default the production-sitelinks ceiling). There is no same-shape
    fallback — past the guard this raises DictionaryTooLargeError and
    callers must use the unfused built-ins pipeline (mentions + qviews +
    triples), whose broadcast joins never materialize the dictionary in
    Python.
    """
    from .mentions import DEFAULT_MAX_DICT_ROWS, collect_dictionary

    spark = documents.sparkSession
    table = collect_dictionary(
        dict_df, DEFAULT_MAX_DICT_ROWS if max_dict_rows is None else max_dict_rows
    )
    bc = spark.sparkContext.broadcast(table)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lookup = bc.value
        for pdf in batches:
            counts: dict[int, int] = {}
            edges: set[tuple[int, int]] = set()
            wbytes: dict[int, int] = {}
            cdocs: dict[int, int] = {}
            media: dict[int, int] = {}
            texts = pdf[text_col].tolist()
            # .tolist() once per batch — Series.iloc per row is the
            # dominant Python cost at millions of docs
            chars = pdf[chars_col].tolist() if signals else [0] * len(texts)
            for text, nc in zip(texts, chars):
                prev = None
                # per-doc item set only in signals mode — the lean
                # kernel (the scaling benchmark) stays allocation-free
                doc_items: set[int] | None = set() if signals else None
                for pos, tok in enumerate(text.split(" ")):
                    if pos % MEDIA_MOD == MEDIA_PHASE:
                        if signals:
                            mitem = lookup.get(tok)
                            if mitem is not None:
                                media[mitem] = media.get(mitem, 0) + 1
                        continue
                    item = lookup.get(tok)
                    if item is None:
                        continue
                    counts[item] = counts.get(item, 0) + 1
                    if doc_items is not None:
                        doc_items.add(item)
                    if prev is not None and prev != item:
                        edges.add((prev, item))
                    prev = item
                if signals and doc_items:
                    nci = int(nc)
                    for item in doc_items:
                        wbytes[item] = wbytes.get(item, 0) + nci
                        cdocs[item] = cdocs.get(item, 0) + 1
            tags = ["v"] * len(counts) + ["e"] * len(edges)
            a = [*counts.keys()] + [e[0] for e in edges]
            b = [0] * len(counts) + [e[1] for e in edges]
            n = [*counts.values()] + [1] * len(edges)
            if signals:
                for tag, d in (("w", wbytes), ("c", cdocs), ("m", media)):
                    tags += [tag] * len(d)
                    a += list(d.keys())
                    b += [0] * len(d)
                    n += list(d.values())
            yield pd.DataFrame(
                {
                    "tag": pd.Series(tags, dtype="object"),
                    "a": pd.Series(a, dtype="int64"),
                    "b": pd.Series(b, dtype="int64"),
                    "n": pd.Series(n, dtype="int64"),
                }
            )

    cols = [text_col] + ([chars_col] if signals else [])
    return documents.select(*cols).mapInPandas(kernel, schema=PARTIALS_SCHEMA)


def kg_partials_vectorized(
    documents: DataFrame,
    dict_df: DataFrame,
    text_col: str = "text",
    max_dict_rows: int | None = None,
    signals: bool = False,
    chars_col: str = "n_chars",
) -> DataFrame:
    """Vectorized formulation of :func:`kg_partials` — identical
    partials (asserted in tests/test_fused.py), different inner shape:
    instead of a per-token Python loop, each Arrow batch flattens to one
    token array and every step runs as a C-level pass —

    * token→item mapping via a pandas hash ``Index.get_indexer`` (khash
      probe, no Python frames per token),
    * media positions from ``arange % MEDIA_MOD`` masks,
    * view counts via ``np.unique(return_counts)``,
    * adjacency edges from consecutive-mention pairs (``same-doc ∧
      different-item`` masks over shifted arrays) + per-batch unique,
    * signals mode: per-(doc, item) distinct pairs via ``np.unique``
      over stacked arrays, then bincount-style sums.

    A/B verdict (BENCH.md, 3.6M docs, 8 pinned cpus, min-of-3): the
    per-token LOOP kernel wins 17.5s vs 51.3s — short docs (~160
    tokens) make dict.get counting O(n) with no materialization, while
    this formulation pays a giant per-batch object-array build plus
    O(n log n) np.unique sorts. Kept as the tested alternative (its
    relative cost shrinks with dictionary miss rate and doc length);
    ``kg_partials`` (loop) remains the default everywhere.
    """
    from .mentions import DEFAULT_MAX_DICT_ROWS, collect_dictionary

    spark = documents.sparkSession
    table = collect_dictionary(
        dict_df, DEFAULT_MAX_DICT_ROWS if max_dict_rows is None else max_dict_rows
    )
    bc = spark.sparkContext.broadcast(table)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mapper = pd.Index(list(bc.value.keys()))
        mapper_ids = np.fromiter(bc.value.values(), dtype=np.int64, count=len(bc.value))
        for pdf in batches:
            texts = pdf[text_col].tolist()
            toklists = [t.split(" ") for t in texts]
            lens = np.fromiter(
                (len(t) for t in toklists), dtype=np.int64, count=len(toklists)
            )
            total = int(lens.sum())
            flat = np.empty(total, dtype=object)
            flat[:] = list(chain.from_iterable(toklists))
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            pos = np.arange(total, dtype=np.int64) - starts[doc_idx]
            is_media = (pos % MEDIA_MOD) == MEDIA_PHASE

            hit = mapper.get_indexer(flat)
            known = hit >= 0
            # ---- text mentions (order preserved: flat is doc-ordered)
            tmask = known & ~is_media
            ids = mapper_ids[hit[tmask]]
            vdoc = doc_idx[tmask]
            v_items, v_counts = (
                np.unique(ids, return_counts=True) if ids.size else ((), ())
            )
            # ---- edges: consecutive mentions in the same doc, distinct
            if ids.size > 1:
                adj = (vdoc[1:] == vdoc[:-1]) & (ids[1:] != ids[:-1])
                e = np.unique(
                    np.stack([ids[:-1][adj], ids[1:][adj]], axis=1), axis=0
                )
            else:
                e = np.empty((0, 2), dtype=np.int64)

            tags = ["v"] * len(v_items) + ["e"] * len(e)
            a = list(v_items) + list(e[:, 0])
            b = [0] * len(v_items) + list(e[:, 1])
            n = list(v_counts) + [1] * len(e)

            if signals:
                chars = pdf[chars_col].to_numpy(dtype=np.int64)
                # media mentions: in-dict tokens at media positions
                mmask = known & is_media
                m_items, m_counts = (
                    np.unique(mapper_ids[hit[mmask]], return_counts=True)
                    if mmask.any()
                    else ((), ())
                )
                # per-(doc, item) distinct pairs → claims docs + char sums
                if ids.size:
                    pairs = np.unique(np.stack([vdoc, ids], axis=1), axis=0)
                    c_items, c_counts = np.unique(pairs[:, 1], return_counts=True)
                    order = np.argsort(pairs[:, 1], kind="stable")
                    psort = pairs[order]
                    csum = np.add.reduceat(
                        chars[psort[:, 0]],
                        np.searchsorted(psort[:, 1], c_items),
                    )
                else:
                    c_items, c_counts, csum = (), (), ()
                for tag, items_, vals in (
                    ("w", c_items, csum),
                    ("c", c_items, c_counts),
                    ("m", m_items, m_counts),
                ):
                    tags += [tag] * len(items_)
                    a += list(items_)
                    b += [0] * len(items_)
                    n += list(vals)

            yield pd.DataFrame(
                {
                    "tag": pd.Series(tags, dtype="object"),
                    "a": pd.Series(a, dtype="int64"),
                    "b": pd.Series(b, dtype="int64"),
                    "n": pd.Series(n, dtype="int64"),
                }
            )

    cols = [text_col] + ([chars_col] if signals else [])
    return documents.select(*cols).mapInPandas(kernel, schema=PARTIALS_SCHEMA)


def combine_partials(partials: DataFrame) -> DataFrame:
    """Single shuffle finishing both outputs: view sums and distinct
    edges in one groupBy (key = (tag, a, b); 'v' rows carry b=0)."""
    return partials.groupBy("tag", "a", "b").agg(F.sum("n").cast("long").alias("n"))


def qviews_from_combined(combined: DataFrame) -> DataFrame:
    # combined already has one row per (v, item, 0) — just project
    return combined.filter(F.col("tag") == "v").select(
        F.col("a").alias("item_id"), F.col("n").alias("views")
    )


def item_signals_from_combined(combined: DataFrame, dict_df: DataFrame) -> DataFrame:
    """Finish item_signals from signals=True partials: one pivot over the
    already-combined per-item sums (v/w/c/m → pageviews_52w /
    wikitext_bytes / claims / sitelinks), identifiers from the (tiny)
    dictionary side. Identical relation to operators.signals.item_signals
    (same DuckDB oracle) — but the corpus was read exactly once for the
    whole build."""
    sigs = (
        combined.filter(F.col("tag") != "e")
        .groupBy("a")
        .pivot("tag", ["v", "w", "c", "m"])
        .sum("n")
    )
    ident = dict_df.groupBy("item_id").agg(
        F.countDistinct("title").cast("long").alias("identifiers")
    )
    return (
        sigs.withColumnRenamed("a", "item_id")
        .join(ident, "item_id", "left")
        .select(
            "item_id",
            F.concat(F.lit("Q"), F.col("item_id")).alias("item"),
            F.coalesce("v", F.lit(0)).cast("long").alias("pageviews_52w"),
            F.coalesce("w", F.lit(0)).cast("long").alias("wikitext_bytes"),
            F.coalesce("c", F.lit(0)).cast("long").alias("claims"),
            F.coalesce("identifiers", F.lit(0)).cast("long").alias("identifiers"),
            F.coalesce("m", F.lit(0)).cast("long").alias("sitelinks"),
        )
    )


def triples_from_combined(combined: DataFrame) -> DataFrame:
    return (
        combined.filter(F.col("tag") == "e")
        .select(
            F.concat(F.lit("Q"), F.col("a")).alias("subj"),
            F.lit(PRED_LINKS_TO).alias("pred"),
            F.concat(F.lit("Q"), F.col("b")).alias("obj"),
            F.col("a").alias("src_id"),
            F.col("b").alias("dst_id"),
        )
        .dropDuplicates(["src_id", "dst_id"])
    )
