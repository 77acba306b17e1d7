"""item_signals golden — cmd/qrank-builder/itemsignals_test.go:92-169.

Fixture: rmwiki + wikidatawiki page_signals, two weekly pageview files;
expected per-item signal vectors incl. views dropped for pages without
an item (rm page 9999) and zero-filled signals.
"""

from __future__ import annotations

from wikidata_qrank_spark.operators.signals import item_signals_from_pages

PAGE_SIGNALS = [
    # wiki, page_id, item, wikitext_bytes, claims, identifiers, sitelinks
    ("rm.wikipedia", 1, "Q5296", 2500, None, None, None),
    ("rm.wikipedia", 3824, "Q662541", 4973, None, None, None),
    ("rm.wikipedia", 799, "Q72", 3142, None, None, None),
    ("www.wikidata", 1, "Q107661323", 3470, None, None, None),
    ("www.wikidata", 19441465, "Q5296", 372, None, None, None),
    ("www.wikidata", 200, "Q72", None, 550, 85, 186),
    ("www.wikidata", 5411171, "Q5649951", None, 1, None, 20),
    ("www.wikidata", 623646, "Q662541", None, 32, 9, 15),
]

WEEKLY_VIEWS = [
    # W07
    ("rm.wikipedia", 1, 314159267),
    ("rm.wikipedia", 3824, 3),
    ("rm.wikipedia", 799, 1111),
    ("www.wikidata", 200, 28),
    # W08
    ("rm.wikipedia", 3824, 2),
    ("rm.wikipedia", 799, 4444),
    ("rm.wikipedia", 9999, 9999),  # no wikidata item → views dropped
    ("www.wikidata", 200, 2),
]

EXPECTED = {
    "Q72": (5585, 3142, 550, 85, 186),
    "Q5296": (314159267, 2872, 0, 0, 0),
    "Q662541": (5, 4973, 32, 9, 15),
    "Q5649951": (0, 0, 1, 0, 20),
    "Q107661323": (0, 3470, 0, 0, 0),
}


def test_item_signals_golden(spark):
    ps = spark.createDataFrame(
        PAGE_SIGNALS,
        "wiki string, page_id long, item string, wikitext_bytes long, "
        "claims long, identifiers long, sitelinks long",
    )
    wv = spark.createDataFrame(WEEKLY_VIEWS, "wiki string, page_id long, views long")
    rows = item_signals_from_pages(ps, wv).collect()
    got = {
        r.item: (r.pageviews_52w, r.wikitext_bytes, r.claims, r.identifiers, r.sitelinks)
        for r in rows
    }
    assert got == EXPECTED
