"""End-to-end build from a raw dumps DIRECTORY — the reference's
TestBuild (cmd/qrank-builder/build_test.go:20-54): dumps tree in, exact
10-line item_signals CSV out, with every stage composed in one call."""

from __future__ import annotations

import glob
import gzip

from tests.dumps_fixture import EXPECTED_ITEM_SIGNALS, write_dumps_tree


def test_read_wiki_sites_discovery(spark, tmp_path):
    from wikidata_qrank_spark.plans.dumps_build import read_wiki_sites

    dumps = write_dumps_tree(tmp_path)
    sites = {s.key: s for s in read_wiki_sites(spark, dumps)}
    # metawiki (sites table only) and enwiki (no dump dir) are excluded
    assert set(sites) == {
        "rmwiki", "rmwikibooks", "itwikibooks", "wikidatawiki", "loginwiki"
    }
    assert sites["rmwiki"].domain == "rm.wikipedia.org"
    assert sites["rmwiki"].wiki == "rm.wikipedia"
    assert sites["rmwiki"].last_dumped == "20240301"
    assert sites["wikidatawiki"].wiki == "www.wikidata"
    assert sites["wikidatawiki"].last_dumped == "20240401"


def test_weekly_pageview_week_selection(tmp_path):
    from wikidata_qrank_spark.plans.dumps_build import find_weekly_pageview_files

    dumps = write_dumps_tree(tmp_path)
    weeks = find_weekly_pageview_files(dumps, num_weeks=4)
    # only ONE complete 7-day week exists (20230317's week has 1 file)
    assert len(weeks) == 1
    assert len(weeks[0]) == 7
    assert all("2023032" in f for f in weeks[0])


def test_dumps_build_end_to_end_golden_csv(spark, tmp_path):
    """The full composition reproduces the reference's TestBuild golden
    byte-for-byte (modulo gzip framing): item rows in numeric id order
    with the exact signal vectors."""
    from wikidata_qrank_spark.plans.dumps_build import run_dumps_build

    dumps = write_dumps_tree(tmp_path)
    out = str(tmp_path / "item_signals-20240501.csv")
    run_dumps_build(spark, dumps, out, num_weeks=1)
    part = glob.glob(out + "/part-*.csv.gz")
    assert len(part) == 1
    with gzip.open(part[0], "rt", encoding="utf-8") as f:
        got = f.read().splitlines()
    assert got == EXPECTED_ITEM_SIGNALS


def test_read_site_dumps_arity_error_names_the_file(spark, tmp_path):
    """A truncated INSERT tuple must fail with the offending file's
    path, not a bare IndexError (900 parallel files otherwise)."""
    import gzip

    import pytest

    from wikidata_qrank_spark.plans.dumps_build import DumpSite, read_site_dumps
    from wikidata_qrank_spark.sources.sqldump import SQLDumpParseError

    d = tmp_path / "badwiki" / "20240101"
    d.mkdir(parents=True)
    with gzip.open(d / "badwiki-20240101-page.sql.gz", "wt") as f:
        f.write(
            "CREATE TABLE `page` (`page_id` int, `page_title` varbinary(255));\n"
            "INSERT INTO `page` VALUES (1,'ok'),(2);\n"
        )
    site = DumpSite("badwiki", "bad.wikipedia.org", "20240101")
    df = read_site_dumps(spark, [site], str(tmp_path), "page", ["page_id"])
    with pytest.raises(Exception, match="badwiki-20240101-page"):
        df.collect()


def test_dumps_build_checkpoint_resume(spark, tmp_path):
    """A checkpointed dumps build re-run against the unchanged tree
    skips both scan stages (the reference's ListStoredFiles
    skip-if-fresh, TestBuildSiteFiles semantics) and still produces the
    golden CSV."""
    import gzip as _gzip

    from wikidata_qrank_spark.plans.dumps_build import run_dumps_build

    dumps = write_dumps_tree(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    out1 = str(tmp_path / "sig1.csv")
    r1 = run_dumps_build(spark, dumps, out1, checkpoint_dir=ckpt)
    assert set(r1["metrics"]) == {"dumps_page_signals", "dumps_weekly_views"}
    assert all(not m["skipped"] for m in r1["metrics"].values())

    out2 = str(tmp_path / "sig2.csv")
    r2 = run_dumps_build(spark, dumps, out2, checkpoint_dir=ckpt)
    assert all(m["skipped"] for m in r2["metrics"].values())
    part = glob.glob(out2 + "/part-*.csv.gz")
    with _gzip.open(part[0], "rt", encoding="utf-8") as f:
        assert f.read().splitlines() == EXPECTED_ITEM_SIGNALS
