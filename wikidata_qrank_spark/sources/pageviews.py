"""Pageview-log parsers — S1/S2 semantics over raw dump lines.

Wikimedia `pageview_complete` dumps are space-separated text:
``site title page_id access_mode count sparkline`` (pageviews.go:504).
Spark reads the bz2 files directly (splittable Hadoop codec — the
reference's hand-rolled parallel bz2 splitting, entities.go:52-149, is
built in). Everything here is map-only column surgery; the weekly /
monthly aggregations are plain groupBy sums (A2/A3) with automatic
map-side partial aggregation replacing the reference's in-scan
run-length pre-sum (A1).

* ``daily_pageviews`` — (wiki, page_id, views); filters P2
  (pageviews.go:504-517): ≥5 columns, page_id > 0, count > 0.
* ``weekly_pageviews`` — A3 MergeCounts (pageviews.go:568-601):
  per-(wiki, page_id) sum over the 7 daily files. Golden:
  pageviews_test.go:193-245.
* ``monthly_pageviews`` — old-pipeline scan (pageviews.go:257-331):
  (page_key, views) with P1 filters (6 columns, dotted site, count>0,
  dead-wiki drop), URL-unescape with keep-raw fallback (F6), formatLine
  key normalization (F1), per-key sum (A2). Golden:
  pageviews_test.go:53-97.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import make_page_key_udf

DEAD_WIKIS = ("en-wg.wikipedia",)


def _cols(line_col):
    # strings.Fields semantics: split on whitespace runs, no empty tokens
    return F.split(F.trim(line_col), r"\s+")


def daily_pageviews(lines: DataFrame, line_col: str = "value") -> DataFrame:
    # try_cast, not cast: real pageview_complete lines carry the literal
    # string 'null' for pages without an id (pageviews.go:504-517 skips
    # them); under Spark 4's ANSI mode a plain cast would fail the task
    c = _cols(F.col(line_col))
    return (
        lines.select(
            c.getItem(0).alias("wiki"),
            c.getItem(2).try_cast("long").alias("page_id"),
            c.getItem(4).try_cast("long").alias("views"),
            F.size(c).alias("__n"),
        )
        .filter(
            (F.col("__n") >= 5)
            & F.col("page_id").isNotNull()
            & (F.col("page_id") > 0)
            & F.col("views").isNotNull()
            & (F.col("views") > 0)
        )
        .drop("__n")
    )


def weekly_pageviews(daily: DataFrame) -> DataFrame:
    """(wiki, page_id, views) summed across the union of daily scans."""
    return daily.groupBy("wiki", "page_id").agg(
        F.sum("views").cast("long").alias("views")
    )


def monthly_pageviews(lines: DataFrame, line_col: str = "value") -> DataFrame:
    c = _cols(F.col(line_col))
    base = (
        lines.select(
            c.getItem(0).alias("site_full"),
            c.getItem(1).alias("raw_title"),
            # try_cast: malformed counts skip the line (ANSI-safe),
            # mirroring the reference's parse-failure skip
            c.getItem(4).try_cast("long").alias("views"),
            F.size(c).alias("__n"),
        )
        .filter(
            (F.col("__n") == 6)
            & F.col("site_full").contains(".")
            & (~F.col("site_full").isin(*DEAD_WIKIS))
            & F.col("views").isNotNull()
            & (F.col("views") > 0)
        )
    )
    # URL-unescape with keep-raw fallback (pageviews.go:280-286)
    decoded = base.withColumn(
        "title", F.coalesce(F.expr("try_url_decode(raw_title)"), F.col("raw_title"))
    )
    dot = F.instr(F.col("site_full"), ".")
    split = decoded.select(
        F.substring(F.col("site_full"), 1, dot - 1).alias("lang"),
        F.expr("substring(site_full, instr(site_full, '.') + 1)").alias("site"),
        "title",
        "views",
    )
    key_udf = make_page_key_udf()
    keyed = split.select(key_udf("lang", "site", "title").alias("page_key"), "views")
    return keyed.groupBy("page_key").agg(F.sum("views").cast("long").alias("views"))
