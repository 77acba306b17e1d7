"""Per-entity signal vectors — item_signals semantics.

Reference: the new pipeline's final stage joins per-page signals with 52
weeks of pageviews and sums a per-entity signal vector
(itemsignals.go:290-388 join, item_signals_writer.go:24-45 final sum;
CSV header `item,pageviews_52w,wikitext_bytes,claims,identifiers,
sitelinks`). Signals here are defined over the interleaved corpus:

* pageviews_52w   — total text-span mentions of the entity (view analog)
* wikitext_bytes  — Σ n_chars over *distinct* documents mentioning it
* claims          — # distinct documents mentioning it
* identifiers     — # distinct surface forms (titles) mapping to it in
                    the canonicalized dictionary
* sitelinks       — total media-span mentions (Commons-file analog)

Everything is a single shuffle on item_id; the distinct-doc signals use
a pre-aggregation by (item, doc) so no count(distinct) blowup — the same
partial-then-final shape as the reference's two-level aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def item_signals_from_pages(
    page_signals: DataFrame, weekly_views: DataFrame
) -> DataFrame:
    """Reference-shape item_signals (J10 join + A7 final sum).

    ``page_signals``: (wiki, page_id, item, wikitext_bytes, claims,
    identifiers, sitelinks) — one row per page per wiki; signal columns
    nullable (only wikidatawiki rows carry claims/identifiers/sitelinks,
    pagesignals.go:377-383).
    ``weekly_views``: (wiki, page_id, views) — 52 weekly files unioned.

    Semantics (itemsignals.go:290-388, item_signals_writer.go:24-45):
    views land on pages; pages without an item drop their views; each
    item sums views across all its pages/wikis plus the element-wise sum
    of the per-page signal vector. Golden: itemsignals_test.go:92-169.

    Physical plan: views are corpus-sized, page_signals is page-dim
    sized; join shuffles both on (wiki, page_id) — partial aggregation
    of views by (wiki, page_id) first cuts the shuffle to one row per
    page per side. Final per-item sum is salting-eligible but item
    cardinality is high and per-item row count ≤ #wikis, so plain
    hash agg is the right plan here (no hot key amplification).
    """
    views_per_page = weekly_views.groupBy("wiki", "page_id").agg(
        F.sum("views").cast("long").alias("views")
    )
    pages = page_signals.join(views_per_page, ["wiki", "page_id"], "left")
    return (
        pages.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(
            F.sum(F.coalesce("views", F.lit(0))).cast("long").alias("pageviews_52w"),
            F.sum(F.coalesce("wikitext_bytes", F.lit(0))).cast("long").alias("wikitext_bytes"),
            F.sum(F.coalesce("claims", F.lit(0))).cast("long").alias("claims"),
            F.sum(F.coalesce("identifiers", F.lit(0))).cast("long").alias("identifiers"),
            F.sum(F.coalesce("sitelinks", F.lit(0))).cast("long").alias("sitelinks"),
        )
    )


def item_signals(
    text_mentions_df: DataFrame,
    media_mentions_df: DataFrame,
    documents: DataFrame,
    dict_df: DataFrame,
) -> DataFrame:
    """(item, pageviews_52w, wikitext_bytes, claims, identifiers,
    sitelinks) — one row per canonical entity."""
    docs_dim = documents.select(F.col("doc_id").cast("string").alias("doc_id"), "n_chars")

    # per-(item, doc) partial: mention count per doc (map-side combinable)
    per_doc = text_mentions_df.groupBy("item_id", "doc_id").agg(
        F.count(F.lit(1)).alias("doc_mentions")
    )
    per_doc = per_doc.join(docs_dim, "doc_id")

    text_sig = per_doc.groupBy("item_id").agg(
        F.sum("doc_mentions").cast("long").alias("pageviews_52w"),
        F.sum("n_chars").cast("long").alias("wikitext_bytes"),
        F.count(F.lit(1)).cast("long").alias("claims"),
    )

    # distinct surface forms per item: a dimension-side aggregate over
    # the canonicalized dictionary — no corpus work at all. Item-keyed
    # and KB-scale (~100 M items at wiki scale), so no broadcast hint:
    # AQE picks the strategy from the aggregated size at runtime.
    ident = dict_df.groupBy("item_id").agg(
        F.countDistinct("title").cast("long").alias("identifiers")
    )

    media_sig = media_mentions_df.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("long").alias("sitelinks")
    )

    out = (
        text_sig.join(media_sig, "item_id", "full")
        .join(ident, "item_id", "left")
        .select(
            F.col("item_id"),
            F.concat(F.lit("Q"), F.col("item_id")).alias("item"),
            F.coalesce("pageviews_52w", F.lit(0)).cast("long").alias("pageviews_52w"),
            F.coalesce("wikitext_bytes", F.lit(0)).cast("long").alias("wikitext_bytes"),
            F.coalesce("claims", F.lit(0)).cast("long").alias("claims"),
            F.coalesce("identifiers", F.lit(0)).cast("long").alias("identifiers"),
            F.coalesce("sitelinks", F.lit(0)).cast("long").alias("sitelinks"),
        )
    )
    return out
