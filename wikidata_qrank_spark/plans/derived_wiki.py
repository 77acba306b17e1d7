"""Wiki-shaped tables derived deterministically from the TPC-H tables —
lets the oracle gate exercise the wiki-pipeline join/agg operators
(J10/A7 item_signals, J7 pagelinks→links) at data scale, not just on
hand goldens.

Derivations (fixed, seedless; mirrored in oracles.py SQL):

* page_signals ← part:   wiki 'w<p_partkey%3>', page_id p_partkey,
  item 'Q<1 + p_partkey%500>' (many pages per item), wikitext_bytes
  p_size, claims p_partkey%7, identifiers p_partkey%5, sitelinks
  p_partkey%11
* weekly_views ← lineitem: wiki 'w<l_partkey%3>', page_id l_partkey,
  views floor(l_quantity) — views land on pages that may or may not
  have a signals row (itemless views dropped, J10 semantics)
* page_items ← part:     page_id p_partkey, item_id 1 + p_partkey%211
* titles ← supplier:     'T<s_suppkey>' → s_suppkey%97 (collisions)
* redirects ← customer:  'R<c_custkey>' → c_custkey%97
* pagelinks ← lineitem:  from_page l_partkey, namespace l_linenumber%2
  (ns 1 gets the 'NS:' localized prefix → unresolvable → dropped, P5),
  title 'R<1 + l_suppkey%1500>' when l_orderkey%4=0 else 'T<l_suppkey>'
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.signals import item_signals_from_pages
from ..operators.wiki import links_from_pagelinks
from ..sources.tables import load_table


def derived_page_signals(part: DataFrame) -> DataFrame:
    k = F.col("p_partkey")
    return part.select(
        F.concat(F.lit("w"), (k % 3).cast("string")).alias("wiki"),
        k.alias("page_id"),
        F.concat(F.lit("Q"), (1 + k % 500).cast("string")).alias("item"),
        F.col("p_size").cast("long").alias("wikitext_bytes"),
        (k % 7).cast("long").alias("claims"),
        (k % 5).cast("long").alias("identifiers"),
        (k % 11).cast("long").alias("sitelinks"),
    )


def derived_weekly_views(lineitem: DataFrame) -> DataFrame:
    return lineitem.select(
        F.concat(F.lit("w"), (F.col("l_partkey") % 3).cast("string")).alias("wiki"),
        F.col("l_partkey").alias("page_id"),
        F.floor(F.col("l_quantity")).cast("long").alias("views"),
    )


def wiki_item_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_page_signals(load_table(spark, sf_dir, "part"))
    wv = derived_weekly_views(load_table(spark, sf_dir, "lineitem"))
    out = item_signals_from_pages(ps, wv)
    return out.select(
        "item", "pageviews_52w", "wikitext_bytes", "claims", "identifiers", "sitelinks"
    )


def wiki_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    page_items = part.select(
        F.col("p_partkey").alias("page_id"),
        (1 + F.col("p_partkey") % 211).cast("long").alias("item_id"),
    )
    titles = supplier.select(
        F.concat(F.lit("T"), F.col("s_suppkey").cast("string")).alias("title"),
        (F.col("s_suppkey") % 97).cast("long").alias("item_id"),
    )
    redirects = customer.select(
        F.concat(F.lit("R"), F.col("c_custkey").cast("string")).alias("title"),
        (F.col("c_custkey") % 97).cast("long").alias("item_id"),
    )
    namespaces = spark.createDataFrame(
        [(0, ""), (1, "NS")], "ns_id int, localized string"
    )
    pagelinks = lineitem.select(
        F.col("l_partkey").alias("from_page"),
        (F.col("l_linenumber") % 2).cast("int").alias("namespace"),
        F.when(
            F.col("l_orderkey") % 4 == 0,
            F.concat(F.lit("R"), (1 + F.col("l_suppkey") % 1500).cast("string")),
        )
        .otherwise(F.concat(F.lit("T"), F.col("l_suppkey").cast("string")))
        .alias("title"),
    )
    return links_from_pagelinks(
        page_items,
        titles.unionByName(redirects),
        namespaces,
        pagelinks_a=pagelinks,
    ).select("subj", "pred", "obj", "src_id", "dst_id")
