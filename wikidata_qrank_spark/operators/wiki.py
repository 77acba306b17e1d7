"""Wiki-pipeline operators: interwiki links, page-signal merge, monthly
qviews — the per-site stages of the reference's new pipeline re-expressed
over DataFrames instead of SQL-dump streams.

Inputs follow FIXTURES.md §2 (the dumps are modeled as tables; the
SQL-dump parser S5 is intentionally dropped — SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------- interwiki


def interwiki_links(
    page_items: DataFrame,
    iwlinks: DataFrame,
    interwiki_map: dict[tuple[str, str], str],
    site_meta: dict[str, tuple[str, str]],
    start_wiki: str,
) -> DataFrame:
    """(target_domain, title, item) — J9 semantics
    (interwikilinks.go:149-209; golden interwikilinks_test.go:16-52).

    ``interwiki_map``: (scope, prefix) → target wiki key, scope being
    ``<wiki>`` (local), ``_<project>`` (project-language) or
    ``__global`` — the reference's three-level resolution chain
    (wikisites.go:164-195). ``site_meta``: wiki key → (domain, project).

    The maps are small (≈15k entries live) → broadcast into an Arrow
    kernel; the bounded prefix-chain loop ('it:m:Foo') runs per row in
    the kernel, mirroring the reference's in-memory lookup loop. The
    only corpus-sized work is the page→item join, which is a broadcast
    or shuffle join on page_id.
    """
    spark = page_items.sparkSession
    bc_map = spark.sparkContext.broadcast(interwiki_map)
    bc_sites = spark.sparkContext.broadcast(site_meta)

    joined = iwlinks.join(
        page_items.select(
            F.col("page_id").alias("from_page"), "item"
        ),
        "from_page",
    ).select("prefix", "title", "item")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        iw = bc_map.value
        sites = bc_sites.value

        def resolve(wiki: str, prefix: str) -> str | None:
            hit = iw.get((wiki, prefix))
            if hit is not None:
                return hit
            meta = sites.get(wiki)
            if meta is not None:
                hit = iw.get(("_" + meta[1], prefix))
                if hit is not None:
                    return hit
            return iw.get(("__global", prefix))

        for pdf in batches:
            domains, titles, items = [], [], []
            for prefix, title, item in zip(pdf["prefix"], pdf["title"], pdf["item"]):
                wiki = resolve(start_wiki, prefix)
                if wiki is None:
                    continue
                # bounded chain: 'it:m:Foo' re-resolves at each hop
                while True:
                    pos = title.find(":")
                    if pos <= 0:
                        break
                    nxt = resolve(wiki, title[:pos])
                    if nxt is None:
                        break
                    wiki = nxt
                    title = title[pos + 1 :]
                meta = sites.get(wiki)
                if meta is None:
                    continue
                domains.append(meta[0])
                titles.append(title)
                items.append(item)
            yield pd.DataFrame(
                {"target_domain": domains, "title": titles, "item": items},
                dtype="object",
            )

    return joined.mapInPandas(
        kernel, schema="target_domain string, title string, item string"
    )


# -------------------------------------------------------- page signals


def page_signals_merge(tagged: DataFrame) -> DataFrame:
    """J2/A5 semantics (pagesignals.go:355-471; golden
    pagesignals_test.go:116-148): merge per-page signal fragments —
    entity from page_props, wikitext bytes from the page table, wikidata
    claim/identifier/sitelink counts — into one row per page; pages
    without an entity are dropped.

    ``tagged``: (page_id, item, wikitext_bytes, claims, identifiers,
    sitelinks) with nulls for absent fragments (the union of the
    fragment streams). The reference's order-sensitive ``last(item)``
    becomes order-insensitive ``max(item)`` — valid because a page has
    at most one wikibase_item (O-9 determinism discipline).
    """
    return (
        tagged.groupBy("page_id")
        .agg(
            F.max("item").alias("item"),
            F.sum("wikitext_bytes").alias("wikitext_bytes"),
            F.sum("claims").alias("claims"),
            F.sum("identifiers").alias("identifiers"),
            F.sum("sitelinks").alias("sitelinks"),
        )
        .filter(F.col("item").isNotNull())
    )


# ----------------------------------------------------- monthly pipeline


def qviews_monthly(
    sitelinks: DataFrame, monthly_pageviews: DataFrame
) -> DataFrame:
    """Old-pipeline qviews (J1 + A4, qviews.go:163-213 + 109-121):
    monthly page-key view counts joined against the broadcast sitelinks
    dictionary, summed per entity; unmatched keys dropped. Golden:
    qviews_test.go:13-45 (tests/test_golden_qrank.py)."""
    from ..functions.normalize import item_to_id
    from .qrank import salted_sum

    # no hard broadcast hint: the production sitelinks dim is ~77 M
    # rows (qrank.org design doc) — KB-scale, past broadcast limits.
    # AQE broadcasts it at test scale on its own.
    joined = monthly_pageviews.join(sitelinks, "page_key").select(
        item_to_id(F.col("item")).alias("item_id"), F.col("views")
    )
    return salted_sum(joined, ["item_id"], "views", "views")


def redirect_targets(
    redirect_df: DataFrame, namespaces: DataFrame | None = None
) -> DataFrame:
    """(from_page, title) from a MediaWiki ``redirect`` table — the P6
    filter made explicit (titles.go:270-293): interwiki redirects
    (``rd_interwiki`` non-empty) are DROPPED, remaining targets get the
    localized namespace prefix. Feeds the same titles/targets join as
    pagelinks; composes with sources.sqldump for real redirect dumps
    (the SQL reader emits NULL as '', so one filter covers both)."""
    r = redirect_df.select(
        F.col("rd_from").cast("long").alias("from_page"),
        F.col("rd_namespace").cast("int").alias("namespace"),
        F.col("rd_title").alias("title"),
        F.col("rd_interwiki").alias("interwiki"),
    ).filter(F.col("interwiki").isNull() | (F.col("interwiki") == ""))
    if namespaces is not None:
        ns = namespaces.select(
            F.col("ns_id").alias("namespace"), F.col("localized").alias("__ns_prefix")
        )
        r = (
            r.join(F.broadcast(ns), "namespace", "left")
            .withColumn(
                "title",
                F.when(
                    (F.col("namespace") != 0)
                    & F.col("__ns_prefix").isNotNull()
                    & (F.col("__ns_prefix") != ""),
                    F.concat(F.col("__ns_prefix"), F.lit(":"), F.col("title")),
                ).otherwise(F.col("title")),
            )
            .drop("__ns_prefix")
        )
    return r.select("from_page", "title")


# ------------------------------------------------------ pagelinks → links


def links_from_pagelinks(
    page_items: DataFrame,
    targets: DataFrame,
    namespaces: DataFrame | None = None,
    pagelinks_a: DataFrame | None = None,
    pagelinks_b: DataFrame | None = None,
    linktarget: DataFrame | None = None,
) -> DataFrame:
    """Entity link edges from MediaWiki pagelinks — J7/J8 semantics
    with the schema-dependent branch (pagelinks.go:122-129: newer dumps
    replaced pl_title/pl_namespace with pl_target_id + a linktarget
    table). Goldens: pagelinks_test.go:17-77 (schema A) and :81-138
    (schema B via linktarget).

    * ``page_items``: (page_id, item_id) — source side.
    * ``targets``: (title, item_id) — titles ∪ redirects (redirect
      canonicalization of the link target, J5/J7).
    * ``namespaces``: (ns_id, localized) — non-main-namespace titles get
      the localized prefix (P5, titles.go:162-169). Broadcast dim.
    * schema A: ``pagelinks_a`` (from_page, namespace, title);
      schema B: ``pagelinks_b`` (from_page, target_id) + ``linktarget``
      (lt_id, namespace, title).

    Output: (subj, pred, obj, src_id, dst_id) deduped, self-loops
    dropped (U2, links.go:60-77).
    """
    from .links import PRED_LINKS_TO

    if pagelinks_a is not None:
        links = pagelinks_a.select("from_page", "namespace", "title")
    elif pagelinks_b is not None and linktarget is not None:
        # linktarget scales with distinct link targets (~page count,
        # tens of millions per large wiki) — no hard broadcast hint;
        # AQE decides from runtime size
        links = pagelinks_b.join(
            linktarget.withColumnRenamed("lt_id", "target_id"),
            "target_id",
        ).select("from_page", "namespace", "title")
    else:
        raise ValueError("need pagelinks_a, or pagelinks_b + linktarget")

    if namespaces is not None:
        ns = namespaces.select(
            F.col("ns_id").alias("namespace"), F.col("localized").alias("__ns_prefix")
        )
        links = links.join(F.broadcast(ns), "namespace", "left").withColumn(
            "title",
            F.when(
                (F.col("namespace") != 0)
                & F.col("__ns_prefix").isNotNull()
                & (F.col("__ns_prefix") != ""),
                F.concat(F.col("__ns_prefix"), F.lit(":"), F.col("title")),
            ).otherwise(F.col("title")),
        ).drop("__ns_prefix")

    # page_items/targets are page-dimension-sized (tens of millions at
    # production scale) — no broadcast hint; Catalyst/AQE picks
    # broadcast vs shuffle join from actual sizes
    edges = (
        links.join(
            page_items.select(
                F.col("page_id").alias("from_page"), F.col("item_id").alias("src_id")
            ),
            "from_page",
        )
        .join(targets.withColumnRenamed("item_id", "dst_id"), "title")
        .filter(F.col("src_id") != F.col("dst_id"))
        .dropDuplicates(["src_id", "dst_id"])
    )
    return edges.select(
        F.concat(F.lit("Q"), F.col("src_id")).alias("subj"),
        F.lit(PRED_LINKS_TO).alias("pred"),
        F.concat(F.lit("Q"), F.col("dst_id")).alias("obj"),
        "src_id",
        "dst_id",
    )
