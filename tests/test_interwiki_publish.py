"""S8 interwiki-map parsing + publish/latest-artifact resolution."""

from __future__ import annotations

import gzip
import glob
from datetime import date

from wikidata_qrank_spark.plans.publish import latest_artifact, publish
from wikidata_qrank_spark.sources.interwiki import build_scoped_maps, parse_interwiki_php

PHP_FIXTURE = """
<?php
$interwikimap = [
\t'__sites:rmwiki' => 'wiki',
\t'__sites:rmwikibooks' => 'wikibooks',
\t'__sites:itwikibooks' => 'wikibooks',
\t'rmwiki:b' => '1 https://rm.wikibooks.org/wiki/$1',
\t'rmwiki:s' => '1 https://rm.wikisource.org/wiki/$1',
\t'__global:d' => '1 https://www.wikidata.org/wiki/$1',
\t'__global:xkcd' => '0 https://xkcd.com/$1',
\t'__global:gutenbergwiki' => '1 https://meta.wikimedia.org/w/index.php?title=X',
\t'__global:dup' => '1 https://old.example.org/wiki/$1',
\t'__global:dup' => '1 https://www.wikidata.org/wiki/$1',
];
"""

DOMAINS = {
    "rm.wikibooks.org": "rmwikibooks",
    "it.wikibooks.org": "itwikibooks",
    "www.wikidata.org": "wikidatawiki",
    "rm.wikipedia.org": "rmwiki",
}


def test_parse_interwiki_php():
    flat = parse_interwiki_php(PHP_FIXTURE)
    assert flat["__sites:rmwiki"] == "wiki"
    assert flat["rmwiki:b"] == "rm.wikibooks.org"
    assert flat["__global:d"] == "www.wikidata.org"
    # '0 ' links and non-/wiki/$1 paths dropped
    assert "__global:xkcd" not in flat
    assert "__global:gutenbergwiki" not in flat
    # last-wins dedup
    assert flat["__global:dup"] == "www.wikidata.org"


def test_build_scoped_maps():
    flat = parse_interwiki_php(PHP_FIXTURE)
    scoped, projects = build_scoped_maps(flat, DOMAINS)
    assert scoped[("rmwiki", "b")] == "rmwikibooks"
    assert scoped[("__global", "d")] == "wikidatawiki"
    # rm.wikisource.org has no known wiki → dropped
    assert ("rmwiki", "s") not in scoped
    # project-language scope derived from __sites
    assert scoped[("_wikibooks", "rm")] == "rmwikibooks"
    assert scoped[("_wikibooks", "it")] == "itwikibooks"
    assert projects["rmwiki"] == "wiki"


def test_publish_and_latest(spark, tmp_path):
    out = str(tmp_path / "public")
    qrank = spark.createDataFrame(
        [("Q4", 77, 1), ("Q1", 1, 2)], "item string, views long, rank long"
    )
    publish(out, date(2024, 3, 1), qrank_df=qrank, stats={"Median": 1, "Samples": []})
    publish(out, date(2024, 4, 1), qrank_df=qrank)
    latest = latest_artifact(out, "qrank")
    assert latest.endswith("qrank-20240401.csv")
    (csv_file,) = glob.glob(latest + "/part-*.csv.gz")
    assert gzip.open(csv_file, "rt").readline().strip() == "Entity,QRank"
    assert latest_artifact(out, "qrank-stats").endswith("qrank-stats-20240301.json")
    assert latest_artifact(out, "nope") is None
