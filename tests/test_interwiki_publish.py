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


def test_artifact_server_conditional_get(tmp_path):
    """main.go:101-140 semantics: quoted ETag, If-None-Match → 304,
    CORS pre-flight, HEAD, 405 Allow, latest-artifact resolution."""
    from wikidata_qrank_spark.plans.serving import ArtifactServer, content_etag

    (tmp_path / "qrank-20240101.csv").write_text("Entity,QRank\nQ1,5\n")
    (tmp_path / "qrank-20240301.csv").write_text("Entity,QRank\nQ1,9\n")
    srv = ArtifactServer(str(tmp_path), basenames=("qrank",))

    status, hdrs, body = srv.handle("GET", "/download/qrank-20240301.csv")
    assert status == 200 and body is not None
    etag = hdrs["ETag"]
    assert etag.startswith('"') and etag.endswith('"')
    assert etag.strip('"') == content_etag(str(tmp_path / "qrank-20240301.csv"))
    assert hdrs["Content-Type"] == "text/csv"
    assert hdrs["Access-Control-Allow-Origin"] == "*"

    # dateless alias resolves to the LATEST artifact
    status, hdrs2, body2 = srv.handle("GET", "/download/qrank.csv")
    assert status == 200 and hdrs2["ETag"] == etag and body2 == body

    # conditional GET: matching If-None-Match → 304 without a body
    status, hdrs3, body3 = srv.handle(
        "GET", "/download/qrank-20240301.csv", {"If-None-Match": etag}
    )
    assert status == 304 and body3 is None and hdrs3["ETag"] == etag
    status, _, _ = srv.handle(
        "GET", "/download/qrank-20240301.csv", {"If-None-Match": '"stale"'}
    )
    assert status == 200

    # HEAD: headers, no body
    status, hdrs4, body4 = srv.handle("HEAD", "/download/qrank-20240301.csv")
    assert status == 200 and body4 is None and hdrs4["ETag"] == etag

    # OPTIONS pre-flight
    status, hdrs5, _ = srv.handle("OPTIONS", "/download/qrank-20240301.csv")
    assert status == 204
    assert hdrs5["Access-Control-Allow-Methods"] == "GET, HEAD, OPTIONS"
    assert hdrs5["Access-Control-Max-Age"] == "86400"

    # other methods → 405 with Allow
    status, hdrs6, _ = srv.handle("PUT", "/download/qrank-20240301.csv")
    assert status == 405 and hdrs6["Allow"] == "GET, HEAD, OPTIONS"

    # unknown artifact → 404; non-download paths hit the Go-style "/"
    # catch-all and serve the landing page (main.go:43,57)
    assert srv.handle("GET", "/download/nope.csv")[0] == 404
    status, hdrs, body = srv.handle("GET", "/qrank-20240301.csv")
    assert status == 200 and b"Wikidata QRank" in body


def test_artifact_server_reload_picks_up_new_version(tmp_path):
    from wikidata_qrank_spark.plans.serving import ArtifactServer

    (tmp_path / "qrank-20240101.csv").write_text("Entity,QRank\nQ1,5\n")
    srv = ArtifactServer(str(tmp_path), basenames=("qrank",))
    assert srv.handle("GET", "/download/qrank-20240301.csv")[0] == 404

    (tmp_path / "qrank-20240301.csv").write_text("Entity,QRank\nQ1,9\n")
    srv.watch(interval=0.01, max_iterations=1)  # one reload tick
    status, _, body = srv.handle("GET", "/download/qrank.csv")
    assert status == 200 and body.endswith("qrank-20240301.csv")


def test_artifact_server_weak_etag_comparison(tmp_path):
    """RFC 7232 §3.2: If-None-Match uses weak comparison — W/"etag"
    must still produce a 304."""
    from wikidata_qrank_spark.plans.serving import ArtifactServer

    (tmp_path / "qrank-20240101.csv").write_text("Entity,QRank\nQ1,5\n")
    srv = ArtifactServer(str(tmp_path), basenames=("qrank",))
    _, hdrs, _ = srv.handle("GET", "/download/qrank-20240101.csv")
    weak = "W/" + hdrs["ETag"]
    status, _, body = srv.handle(
        "GET", "/download/qrank-20240101.csv", {"If-None-Match": weak}
    )
    assert status == 304 and body is None
