"""Pageview parser goldens — pageviews_test.go:53-97 and :193-245."""

from __future__ import annotations

from wikidata_qrank_spark.sources.pageviews import (
    daily_pageviews,
    monthly_pageviews,
    weekly_pageviews,
)

MONTHLY_LINES = [
    "als.wikipedia Ägypte 4623 mobile-web 2 N1P1",
    "als.wikipedia Ägypte 8911 desktop 3 A2X1",
    "ang.wikipedia Lech_Wałęsa 10374 desktop 1 Q1",
    "en-wg.wikipedia/Talk:Main_Page  67072 desktop 4 B4",  # dead wiki → dropped
    "zh-min-nan.wikipedia Ìn-tō͘-chi-ná 670272 desktop 1 J1",
    "only three columns",
    "",
]


def test_monthly_golden(spark):
    df = spark.createDataFrame([(l,) for l in MONTHLY_LINES], "value string")
    got = {r.page_key: r.views for r in monthly_pageviews(df).collect()}
    assert got == {
        "gsw.wikipedia/ägypte": 5,
        "ang.wikipedia/lech_wałęsa": 1,
        "nan.wikipedia/ìn-tō͘-chi-ná": 1,
    }


def test_monthly_url_unescape(spark):
    df = spark.createDataFrame(
        [
            ("en.wikipedia Lech_Wa%C5%82%C4%99sa 1 desktop 2 Q1",),
            ("en.wikipedia Bad%zzEscape 1 desktop 3 Q1",),  # keep raw on error
        ],
        "value string",
    )
    got = {r.page_key: r.views for r in monthly_pageviews(df).collect()}
    assert got == {
        "en.wikipedia/lech_wałęsa": 2,
        "en.wikipedia/bad%zzescape": 3,
    }


DAILY_LINES = [
    "commons.wikimedia Category:X 2527294 desktop 1 B1",
    "de.wikipedia Foo 585473 desktop 20 A1",
    "de.wikipedia Foo 585473 mobile-web 2 N1",
    "rm.wikipedia Obergesteln 3824 desktop 3 J1",
    "xx.wikipedia NoCount 5 desktop 0 Z1",   # count 0 → dropped
    "xx.wikipedia NoPage 0 desktop 7 Z1",    # page_id 0 → dropped
    "short line",
]


def test_daily_and_weekly(spark):
    df = spark.createDataFrame([(l,) for l in DAILY_LINES], "value string")
    weekly = weekly_pageviews(daily_pageviews(df))
    got = {(r.wiki, r.page_id): r.views for r in weekly.collect()}
    assert got == {
        ("commons.wikimedia", 2527294): 1,
        ("de.wikipedia", 585473): 22,
        ("rm.wikipedia", 3824): 3,
    }
