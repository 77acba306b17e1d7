"""Dumps-directory end-to-end build: the day-one path of a reference
user — point the engine at a Wikimedia dumps TREE (the layout of
``cmd/qrank-builder/testdata/dumps``) and get item_signals out.

Composes the already-tested stages exactly like the reference's
``Build()`` (build.go:20-56): site discovery from the sites table +
``latest`` symlinks (wikisites.go:46-123), per-site page/page_props
scans → page-signal fragments (pagesignals.go:104-231), weekly
pageview aggregation from the daily ``pageview_complete`` files
(pageviews.go:504-601), then the item_signals join/sum
(itemsignals.go:290-388).

Scale shape
-----------
* Site discovery and the sites table are DIM work (≈1000 rows):
  driver-side listing + one bounded collect, like the reference.
* Every per-site ``.sql.gz`` dump is gzip — NOT splittable — so the
  correct physical plan is one task per file, parallel ACROSS files:
  all sites' dumps of one table are read in a single ``spark.read.text
  (paths, wholetext)`` scan (900 wikis → 900 parallel tasks, one scan
  in the plan — not 900 union legs).
* Daily pageview files are bz2 — splittable — so they stream through
  the ordinary line-parallel ``daily_pageviews`` scan.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# tables whose `latest` symlink vintage defines a site's LastDumped
# (wikisites.go:101-113; min across them = newest consistent dump)
_VINTAGE_TABLES = ("page", "pagelinks", "page_props")

_PV_NAME = re.compile(r"pageviews-(\d{8})-user\.bz2$")


@dataclass(frozen=True)
class DumpSite:
    key: str  # Wikimedia key, e.g. "rmwiki"
    domain: str  # e.g. "rm.wikipedia.org"
    last_dumped: str  # ymd, e.g. "20240301"

    @property
    def wiki(self) -> str:
        """The pageview-file site label: domain minus '.org'."""
        return self.domain.removesuffix(".org")

    def dump_file(self, dumps_dir: str, table: str) -> str:
        name = f"{self.key}-{self.last_dumped}-{table}.sql.gz"
        return os.path.join(dumps_dir, self.key, self.last_dumped, name)


def read_wiki_sites(spark: SparkSession, dumps_dir: str) -> list[DumpSite]:
    """Discover the sites with complete dumps (ReadWikiSites,
    wikisites.go:46-123): rows of the metawiki ``sites`` table whose key
    has a dump directory AND at least one resolvable
    ``<key>/latest/<key>-latest-<table>.sql.gz`` symlink; LastDumped =
    the OLDEST vintage among the resolvable tables (the newest date at
    which every table exists). The sites table is a ~1000-row dim —
    collecting it is bounded by design."""
    from ..functions.normalize import decode_domain
    from ..sources.sqldump import read_sql_dump_whole

    sites_link = os.path.join(
        dumps_dir, "metawiki", "latest", "metawiki-latest-sites.sql.gz"
    )
    sites_path = os.path.realpath(sites_link)  # race-safe resolved path
    if not os.path.exists(sites_path):
        raise FileNotFoundError(sites_link)
    rows = (
        read_sql_dump_whole(spark, sites_path)
        .select(
            "site_global_key", decode_domain(F.col("site_domain")).alias("domain")
        )
        .collect()
    )
    out: list[DumpSite] = []
    for r in rows:
        key = r["site_global_key"]
        if not os.path.isdir(os.path.join(dumps_dir, key)):
            continue
        vintages = []
        for table in _VINTAGE_TABLES:
            link = os.path.join(
                dumps_dir, key, "latest", f"{key}-latest-{table}.sql.gz"
            )
            resolved = os.path.realpath(link)
            if not os.path.exists(resolved):
                continue
            ymd = os.path.basename(os.path.dirname(resolved))
            if re.fullmatch(r"\d{8}", ymd):
                vintages.append(ymd)
        if vintages:
            out.append(DumpSite(key, r["domain"], min(vintages)))
    return out


def read_site_dumps(
    spark: SparkSession,
    sites: list[DumpSite],
    dumps_dir: str,
    table: str,
    columns: list[str],
) -> DataFrame:
    """One distributed scan over EVERY site's dump of ``table``:
    (wiki_key, *columns) as strings. gzip is unsplittable, so the
    physical unit is one whole file per task — but all files ride one
    ``spark.read.text(wholetext)`` scan, so 900 wikis parse as 900
    parallel tasks without 900 plan legs. Sites missing the table are
    skipped (not every wiki dumps every table). Column projection is by
    name against each file's own CREATE header, so per-wiki schema
    drift (extra columns) is harmless."""
    from ..sources.sqldump import (
        SQLDumpParseError,
        _tokens_no_comments,
        iter_insert_rows,
        lex_sql,
        parse_create_columns,
    )

    paths = [
        p
        for s in sites
        if os.path.exists(p := s.dump_file(dumps_dir, table))
    ]
    schema = "wiki_key string, " + ", ".join(f"`{c}` string" for c in columns)
    if not paths:
        return spark.createDataFrame([], schema)
    wanted = list(columns)
    whole = spark.read.text(paths, wholetext=True).select(
        F.input_file_name().alias("path"), "value"
    )

    def parse(rows: Iterator) -> Iterator[tuple]:
        for r in rows:
            key = os.path.basename(r["path"]).split("-", 1)[0]
            text = r["value"]
            cols = parse_create_columns(_tokens_no_comments(lex_sql(text)))
            try:
                idx = [cols.index(c) for c in wanted]
            except ValueError as e:
                raise SQLDumpParseError(
                    f"{r['path']}: missing column in CREATE ({e})"
                ) from None
            for row in iter_insert_rows(lex_sql(text)):
                if len(row) != len(cols):
                    # name the file: at 900 wikis per scan a bare
                    # IndexError is undebuggable
                    raise SQLDumpParseError(
                        f"{r['path']}: row arity {len(row)} != "
                        f"{len(cols)} CREATE columns"
                    )
                yield (key, *[row[i] for i in idx])

    return whole.rdd.mapPartitions(parse).toDF(schema)


_WIKIDATA_TITLE = r"^Q\d+$"


def page_signals_from_dumps(
    spark: SparkSession, sites: list[DumpSite], dumps_dir: str
) -> DataFrame:
    """(wiki, page_id, item, wikitext_bytes, claims, identifiers,
    sitelinks) for every site — the buildPageSignals stage
    (pagesignals.go:104-231) for ALL sites in one plan:

    * page_props: wikibase_item → the page's item; wb-claims /
      wb-identifiers / wb-sitelinks → wikidata count signals.
    * page: content_model='wikitext' → wikitext_bytes=page_len; on
      wikidatawiki, ns-0 titles matching Q\\d+ ARE the item (the
      page_props of wikidatawiki only covers maintenance pages,
      pagesignals.go:203-222 / issue #35).

    Fragment union → one (wiki, page_id) merge; pages without an item
    drop (the same merge the per-stage golden tests cover).
    """
    props = read_site_dumps(
        spark, sites, dumps_dir, "page_props", ["pp_page", "pp_propname", "pp_value"]
    )
    page = read_site_dumps(
        spark,
        sites,
        dumps_dir,
        "page",
        ["page_id", "page_namespace", "page_title", "page_content_model", "page_len"],
    )

    pid = F.col("pp_page").cast("long")
    val = F.col("pp_value")
    nul = F.lit(None).cast("long")
    nus = F.lit(None).cast("string")

    def _prop_frag(propname: str, item, wb, cl, ident, sl):
        return props.filter(F.col("pp_propname") == propname).select(
            "wiki_key", pid.alias("page_id"), item, wb, cl, ident, sl
        )

    frags = [
        _prop_frag(
            "wikibase_item", val.alias("item"), nul.alias("wikitext_bytes"),
            nul.alias("claims"), nul.alias("identifiers"), nul.alias("sitelinks"),
        ),
        _prop_frag(
            "wb-claims", nus.alias("item"), nul.alias("wikitext_bytes"),
            val.cast("long").alias("claims"), nul.alias("identifiers"),
            nul.alias("sitelinks"),
        ),
        _prop_frag(
            "wb-identifiers", nus.alias("item"), nul.alias("wikitext_bytes"),
            nul.alias("claims"), val.cast("long").alias("identifiers"),
            nul.alias("sitelinks"),
        ),
        _prop_frag(
            "wb-sitelinks", nus.alias("item"), nul.alias("wikitext_bytes"),
            nul.alias("claims"), nul.alias("identifiers"),
            val.cast("long").alias("sitelinks"),
        ),
        page.filter(F.col("page_content_model") == "wikitext").select(
            "wiki_key",
            F.col("page_id").cast("long").alias("page_id"),
            nus.alias("item"),
            F.col("page_len").cast("long").alias("wikitext_bytes"),
            nul.alias("claims"), nul.alias("identifiers"), nul.alias("sitelinks"),
        ),
        page.filter(
            (F.col("wiki_key") == "wikidatawiki")
            & (F.col("page_namespace") == "0")
            & F.col("page_title").rlike(_WIKIDATA_TITLE)
        ).select(
            "wiki_key",
            F.col("page_id").cast("long").alias("page_id"),
            F.col("page_title").alias("item"),
            nul.alias("wikitext_bytes"),
            nul.alias("claims"), nul.alias("identifiers"), nul.alias("sitelinks"),
        ),
    ]
    tagged = frags[0]
    for f in frags[1:]:
        tagged = tagged.unionByName(f)
    merged = (
        tagged.groupBy("wiki_key", "page_id")
        .agg(
            F.max("item").alias("item"),
            F.sum("wikitext_bytes").alias("wikitext_bytes"),
            F.sum("claims").alias("claims"),
            F.sum("identifiers").alias("identifiers"),
            F.sum("sitelinks").alias("sitelinks"),
        )
        .filter(F.col("item").isNotNull())
    )
    # wiki_key → pageview site label via the broadcast site dim
    dim = spark.createDataFrame(
        [(s.key, s.wiki) for s in sites], "wiki_key string, wiki string"
    )
    return merged.join(F.broadcast(dim), "wiki_key").select(
        "wiki", "page_id", "item", "wikitext_bytes", "claims", "identifiers",
        "sitelinks",
    )


def find_weekly_pageview_files(
    dumps_dir: str, num_weeks: int = 1
) -> list[list[str]]:
    """Group the daily ``pageview_complete`` files by ISO week, keep
    COMPLETE weeks (7 days), return the newest ``num_weeks`` (newest
    first) — buildPageviews' week selection (pageviews.go:46-120).
    Driver-side directory metadata, like the reference."""
    from datetime import datetime

    root = os.path.join(dumps_dir, "other", "pageview_complete")
    by_week: dict[tuple[int, int], list[str]] = {}
    for dirpath, _dirs, files in os.walk(root):
        for name in files:
            m = _PV_NAME.search(name)
            if not m:
                continue
            day = datetime.strptime(m.group(1), "%Y%m%d").date()
            iso = day.isocalendar()
            by_week.setdefault((iso[0], iso[1]), []).append(
                os.path.join(dirpath, name)
            )
    complete = {wk: sorted(fs) for wk, fs in by_week.items() if len(fs) == 7}
    newest = sorted(complete, reverse=True)[:num_weeks]
    return [complete[wk] for wk in newest]


def weekly_views_from_dumps(
    spark: SparkSession, dumps_dir: str, num_weeks: int = 1
) -> DataFrame:
    """(wiki, page_id, views) — one row per page per WEEK (the shape
    item_signals_from_pages consumes; 52 weekly files in production).
    bz2 is splittable, so each week is a plain line-parallel scan."""
    from ..sources.pageviews import daily_pageviews, weekly_pageviews

    weeks = find_weekly_pageview_files(dumps_dir, num_weeks)
    out: DataFrame | None = None
    for files in weeks:
        wk = weekly_pageviews(daily_pageviews(spark.read.text(files)))
        out = wk if out is None else out.unionByName(wk)
    if out is None:
        return spark.createDataFrame([], "wiki string, page_id long, views long")
    return out


def build_item_signals_from_dumps(
    spark: SparkSession,
    dumps_dir: str,
    num_weeks: int = 1,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The whole Build() composition (build.go:20-56) from a raw dumps
    tree: discovery → per-site page signals → weekly views →
    item_signals, with ``item_id`` attached for the CSV writer's
    numeric ordering. Views on wikis without dumps drop in the join,
    exactly like the reference (it never scans such wikis).

    With ``checkpoint_dir``, the scan stages run under the
    CheckpointManager, versioned by the site VINTAGES (key:ymd set) and
    the selected pageview files: a re-run against an unchanged dumps
    tree skips both scans — the reference's ListStoredFiles
    skip-if-fresh behavior (build.go:76-106, TestBuildSiteFiles) —
    and the outputs carry snapshot + partition lineage columns."""
    sig, _metrics = _item_signals_with_metrics(
        spark, dumps_dir, num_weeks, checkpoint_dir
    )
    return sig


def _item_signals_with_metrics(
    spark: SparkSession,
    dumps_dir: str,
    num_weeks: int,
    checkpoint_dir: str | None,
) -> tuple[DataFrame, dict]:
    from ..functions.normalize import item_to_id
    from ..operators.signals import item_signals_from_pages

    sites = read_wiki_sites(spark, dumps_dir)
    metrics: dict = {}
    if checkpoint_dir is None:
        ps = page_signals_from_dumps(spark, sites, dumps_dir)
        wv = weekly_views_from_dumps(spark, dumps_dir, num_weeks)
    else:
        from .checkpoint import (
            LINEAGE_PARTITION_COL,
            LINEAGE_SNAPSHOT_COL,
            CheckpointManager,
        )

        mgr = CheckpointManager(spark, checkpoint_dir)
        site_version = CheckpointManager.stage_version(
            *[f"{s.key}:{s.last_dumped}" for s in sites]
        )
        week_files = find_weekly_pageview_files(dumps_dir, num_weeks)
        week_version = CheckpointManager.stage_version(
            *[os.path.basename(f) for files in week_files for f in files]
        )
        ps = mgr.run_stage(
            "dumps_page_signals",
            site_version,
            lambda: page_signals_from_dumps(spark, sites, dumps_dir),
        ).drop(LINEAGE_PARTITION_COL, LINEAGE_SNAPSHOT_COL)
        wv = mgr.run_stage(
            "dumps_weekly_views",
            week_version,
            lambda: weekly_views_from_dumps(spark, dumps_dir, num_weeks),
        ).drop(LINEAGE_PARTITION_COL, LINEAGE_SNAPSHOT_COL)
        metrics = mgr.metrics()
    sig = item_signals_from_pages(ps, wv)
    return sig.withColumn("item_id", item_to_id(F.col("item"))), metrics


def run_dumps_build(
    spark: SparkSession,
    dumps_dir: str,
    out_path: str,
    num_weeks: int = 1,
    checkpoint_dir: str | None = None,
) -> dict:
    """Build + publish the item_signals CSV (gzip, numeric-item order —
    the byte format of TestBuild's golden, build_test.go:33-52).
    Returns {'out': path, 'metrics': per-stage metrics} (metrics empty
    without a checkpoint_dir)."""
    from ..operators.sinks import write_item_signals_csv

    sig, metrics = _item_signals_with_metrics(
        spark, dumps_dir, num_weeks, checkpoint_dir
    )
    write_item_signals_csv(sig, out_path)
    return {"out": out_path, "metrics": metrics}
