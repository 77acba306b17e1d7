"""Entity-dump parse goldens — entities_test.go:129-194."""

from __future__ import annotations

import json

from wikidata_qrank_spark.sources.entities import (
    sitelinks_from_entity,
    sitelinks_from_json,
)

SPECIAL = json.dumps(
    {
        "type": "item",
        "id": "Q132576",
        "sitelinks": {
            "enwiki": {"site": "enwiki", "title": "Impala"},
            "alswikiquote": {"site": "alswikiquote", "title": "Impala"},
            "be_x_old_wiki": {"site": "be_x_oldwiki", "title": "Імпала"},
            "commonswiki": {"site": "commonswiki", "title": "Aepyceros melampus"},
            "roa_rupwiki": {"site": "roa_rupwiki", "title": "Impala"},
            "simplewiki": {"site": "simplewiki", "title": "Impala"},
            "simplewikinews": {"site": "simplewikinews", "title": "Impala"},
            "specieswiki": {"site": "specieswiki", "title": "Aepyceros melampus"},
            "wikidatawiki": {"site": "wikidatawiki", "title": "Project_chat"},
            "zh_classicalwikisource": {
                "site": "zh_classicalwikisource",
                "title": "Impala",
            },
            "zh_min_nanwiki": {"site": "zh_min_nanwiki", "title": "Impala"},
        },
    },
    ensure_ascii=False,
)

EXPECTED = [
    ("be-tarask.wikipedia/імпала", "Q132576"),
    ("en-x-simple.wikinews/impala", "Q132576"),
    ("en-x-simple.wikipedia/impala", "Q132576"),
    ("en.wikipedia/impala", "Q132576"),
    ("gsw.wikiquote/impala", "Q132576"),
    ("lzh.wikisource/impala", "Q132576"),
    ("nan.wikipedia/impala", "Q132576"),
    ("rup.wikipedia/impala", "Q132576"),
    ("und.commons/aepyceros_melampus", "Q132576"),
    ("und.wikidata/project_chat", "Q132576"),
    ("und.wikispecies/aepyceros_melampus", "Q132576"),
]

STATION = json.dumps(
    {
        "type": "item",
        "id": "Q58977",
        "sitelinks": {
            "jawiki": {"site": "jawiki", "title": "西慶州駅"},
            "kowiki": {"site": "kowiki", "title": "서경주역"},
            "commonswiki": {"site": "commonswiki", "title": "Category:Seogyeongju station"},
            "zhwiki": {"site": "zhwiki", "title": "西庆州站"},
        },
    },
    ensure_ascii=False,
)

STATION_EXPECTED = [
    ("ja.wikipedia/西慶州駅", "Q58977"),
    ("ko.wikipedia/서경주역", "Q58977"),
    ("und.commons/category:seogyeongju_station", "Q58977"),
    ("zh.wikipedia/西庆州站", "Q58977"),
]


def test_special_sitelinks_golden_python():
    assert sitelinks_from_entity(SPECIAL) == EXPECTED


def test_station_golden_python():
    assert sitelinks_from_entity(STATION) == STATION_EXPECTED


def test_sitelinks_from_json_spark(spark):
    df = spark.createDataFrame([(SPECIAL,), (STATION,)], "value string")
    got = sorted(
        (r.page_key, r.item) for r in sitelinks_from_json(df).collect()
    )
    assert got == sorted(EXPECTED + STATION_EXPECTED)


def test_non_item_entities_dropped(spark):
    lexeme = json.dumps(
        {"id": "L123", "sitelinks": {"enwiki": {"site": "enwiki", "title": "X"}}}
    )
    nowiki = json.dumps(
        {"id": "Q1", "sitelinks": {"foobar": {"site": "foobar", "title": "X"}}}
    )
    df = spark.createDataFrame([(lexeme,), (nowiki,), ("not json",)], "value string")
    assert sitelinks_from_json(df).count() == 0


def test_find_entities_dump_follows_symlink(tmp_path):
    """entities.go:26-45: resolve latest-all through the symlink, parse
    the date from the resolved parent dir, return the resolved path."""
    import os
    from datetime import date

    from wikidata_qrank_spark.sources.entities import find_entities_dump

    d = tmp_path / "wikidatawiki" / "entities" / "20240301"
    d.mkdir(parents=True)
    real = d / "wikidata-20240301-all.json.bz2"
    real.write_bytes(b"")
    link = tmp_path / "wikidatawiki" / "entities" / "latest-all.json.bz2"
    os.symlink(real, link)

    got_date, got_path = find_entities_dump(str(tmp_path))
    assert got_date == date(2024, 3, 1)
    assert got_path == str(real)


def test_find_entities_dump_missing(tmp_path):
    import pytest as _pytest

    from wikidata_qrank_spark.sources.entities import find_entities_dump

    with _pytest.raises(FileNotFoundError):
        find_entities_dump(str(tmp_path))
