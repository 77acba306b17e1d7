"""formatLine parity — golden cases from cmd/qrank-builder/util_test.go:67-160."""

from __future__ import annotations

import pytest

from wikidata_qrank_spark.functions.normalize import (
    format_page_key,
    make_page_key_udf,
    parse_item,
    _LEXEME_FLAG,
)

GOLDEN = [
    ("als", "wikipedia", "Wähe", "gsw.wikipedia/wähe"),
    ("tr", "wikipedia", "DİYARBAKIR", "tr.wikipedia/diyarbakır"),
    ("az", "wikipedia", "İqtİsadİyyat", "az.wikipedia/iqtisadiyyat"),
    ("simple", "wikipedia", "Tianjin", "en-x-simple.wikipedia/tianjin"),
    ("zh_min_nan", "wikipedia", "Nî", "nan.wikipedia/nî"),
    ("zh-min-nan", "wikipedia", "Nî", "nan.wikipedia/nî"),
    ("de", "wikipedia", "Straße", "de.wikipedia/strasse"),
    ("incubator", "wikipedia", "Wp/cpx/Teng-cing-chī", "cpx.wikipedia/teng-cing-chī"),
    ("xx", "wikipedia", "Tab\tC", "xx.wikipedia/tab_c"),
    ("", "wikidatawiki", "Q72", "und.wikidata/q72"),
    ("commons", "wikimedia", "Zürich", "und.commons/zürich"),
    ("be_x_old", "wikipedia", "Менск", "be-tarask.wikipedia/менск"),
    ("bat_smg", "wikipedia", "X", "sgs.wikipedia/x"),
    ("fiu_vro", "wikipedia", "X", "vro.wikipedia/x"),
    ("map_bms", "wikipedia", "X", "jv-x-bms.wikipedia/x"),
    ("roa_tara", "wikipedia", "X", "nap-x-tara.wikipedia/x"),
    ("zh_classical", "wikipedia", "X", "lzh.wikipedia/x"),
    ("zh_yue", "wikipedia", "X", "yue.wikipedia/x"),
    ("nds_nl", "wikipedia", "X", "nds-NL.wikipedia/x"),
    ("species", "wikimedia", "Pan", "und.wikispecies/pan"),
    ("meta", "wikimedia", "Help", "und.metawiki/help"),
    ("en", "wikipedia", "A b c", "en.wikipedia/a_b_c"),
]


@pytest.mark.parametrize("lang,site,title,expected", GOLDEN)
def test_format_page_key(lang, site, title, expected):
    assert format_page_key(lang, site, title) == expected


def test_page_key_udf_matches_python(spark):
    df = spark.createDataFrame(
        [(lang, site, title) for lang, site, title, _ in GOLDEN],
        "lang string, site string, title string",
    )
    udf = make_page_key_udf()
    got = [r.key for r in df.select(udf("lang", "site", "title").alias("key")).collect()]
    assert got == [exp for _, _, _, exp in GOLDEN]


def test_parse_item():
    assert parse_item("Q72") == 72
    assert parse_item("Q1") == 1
    assert parse_item("L9") == 9 | _LEXEME_FLAG
    assert parse_item("") is None
    assert parse_item("Q") is None
    assert parse_item("X72") is None
    assert parse_item("Q72x") is None


def test_iso_week():
    from wikidata_qrank_spark.functions.normalize import iso_week_start, parse_iso_week

    assert parse_iso_week("2023-W07") == (2023, 7)
    assert iso_week_start(2023, 7).isoformat() == "2023-02-13"
    assert iso_week_start(2011, 7).isoformat() == "2011-02-14"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_iso_week("2023W07")
