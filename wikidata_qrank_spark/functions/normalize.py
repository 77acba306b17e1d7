"""Scalar kernels with reference parity.

* ``format_page_key`` — semantics of the reference's ``formatLine``
  (cmd/qrank-builder/util.go:119-251): Wikipedia edition-code remapping,
  Turkish/Azeri special lowercasing, Unicode case-fold + NFC
  normalization, control chars/space → ``_``, joined as
  ``lang.site/title``. Golden-tested against util_test.go:67-160 cases.
* ``parse_item`` — ``Q72`` ↔ 72, ``L9`` ↔ lexeme flag
  (util.go:32-60 ``ParseItem``; we keep items as plain strings in data
  and convert to int64 only for shuffle/sort efficiency).
* ``decode_domain`` — un-reverse the sites-table domain encoding
  (wikisites.go:197-204).

The hot-path entry point is ``make_page_key_udf`` — an Arrow-batched
pandas UDF (no per-row Python UDFs anywhere in the engine). String
normalization genuinely needs ICU-ish casefold + NFC which Spark
built-ins lack, so this is one of the few justified Python kernels; it
runs vectorized over Arrow batches.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Wikipedia edition-code remaps (util.go:119-251). Underscore and hyphen
# spellings both occur in the wild; normalize the key first.
_LANG_REMAP = {
    "als": "gsw",
    "bat-smg": "sgs",
    "be-x-old": "be-tarask",
    "cbk-zam": "cbk-x-zam",
    "fiu-vro": "vro",
    "map-bms": "jv-x-bms",
    "roa-rup": "rup",
    "roa-tara": "nap-x-tara",
    "simple": "en-x-simple",
    "nds-nl": "nds-NL",
    "zh-classical": "lzh",
    "zh-min-nan": "nan",
    "zh-yue": "yue",
}

# langs that are really site designators (util.go: commons/media/meta/...)
_SITE_OVERRIDE = {
    "commons": ("und", "commons"),
    "media": ("und", "mediawiki"),
    "meta": ("und", "metawiki"),
    "sources": ("und", "wikisource"),
    "species": ("und", "wikispecies"),
}

# Turkish/Azeri dotted/dotless I handling: Go applies
# ToLowerSpecial(TurkishCase/AzeriCase) before the case fold
# (util.go:132,211-212). Python's casefold maps I→i, so pre-map the two
# special capitals first.
_TURKIC_PREMAP = str.maketrans({"I": "ı", "İ": "i"})


def _remap_lang_site_title(lang: str, site: str, title: str) -> tuple[str, str, str]:
    if lang == "":
        lang = "und"
        if site == "wikidatawiki":
            site = "wikidata"
        elif site == "wikimaniawiki":
            site = "wikimania"
        return lang, site, title
    if lang in ("tr", "az"):
        return lang, site, title.translate(_TURKIC_PREMAP)
    if lang == "incubator":
        # 'Wp/cpx/Teng-cing-chī' → lang=cpx, title=Teng-cing-chī
        parts = title.split("/", 2)
        if len(parts) == 3 and parts[0] in ("Wp", "wp") and len(parts[1]) < 20:
            return parts[1].lower(), site, parts[2]
        return lang, site, title
    key = lang.replace("_", "-")
    if key in _SITE_OVERRIDE:
        new_lang, new_site = _SITE_OVERRIDE[key]
        return new_lang, new_site, title
    return _LANG_REMAP.get(key, lang), site, title


def format_page_key(lang: str, site: str, title: str) -> str:
    """Canonical page key ``lang.site/title`` (formatLine minus the value
    column — in a DataFrame engine the value is its own column)."""
    lang, site, title = _remap_lang_site_title(lang or "", site or "", title or "")
    folded = unicodedata.normalize("NFC", title.casefold())
    cleaned = "".join("_" if ch <= "\x20" else ch for ch in folded)
    return f"{lang}.{site}/{cleaned}"


def normalize_title(title: str) -> str:
    """Casefold + NFC + ctrl-char scrub only (no lang remap)."""
    folded = unicodedata.normalize("NFC", (title or "").casefold())
    return "".join("_" if ch <= "\x20" else ch for ch in folded)


PAGE_KEY_UDF_RETURNS = T.StringType()


def make_page_key_udf():
    """Arrow-batched page-key kernel: (lang, site, title) → key."""

    @F.pandas_udf(PAGE_KEY_UDF_RETURNS)
    def page_key(lang: pd.Series, site: pd.Series, title: pd.Series) -> pd.Series:
        return pd.Series(
            [format_page_key(lg, st, ti) for lg, st, ti in zip(lang, site, title)],
            dtype="object",
        )

    return page_key


def make_normalize_title_udf():
    @F.pandas_udf(T.StringType())
    def norm_title(title: pd.Series) -> pd.Series:
        return title.map(normalize_title)

    return norm_title


# DELIBERATE deviation from the reference's packed form: util.go:35
# uses bit 63 (lexemeMask 0x8000000000000000) in a Go uint64; Spark's
# LongType is a signed int64, where bit 63 flips ids negative and
# breaks min/ordering aggregation semantics everywhere downstream. We
# use bit 62 instead — same information, internally consistent
# round-trip (parse_item/id_to_item) — so packed ids are NOT
# bit-interchangeable with reference-format packed ids; the rendered
# 'Q…'/'L…' strings are.
_LEXEME_FLAG = 1 << 62


def parse_item(s: str) -> int | None:
    """'Q72' → 72; 'L9' → 9 | lexeme flag (bit 62, see _LEXEME_FLAG
    note — the reference packs bit 63, util.go:37-60); junk → None."""
    if not s or len(s) < 2:
        return None
    head, tail = s[0], s[1:]
    if not tail.isdigit():
        return None
    n = int(tail)
    if head == "Q":
        return n
    if head == "L":
        return n | _LEXEME_FLAG
    return None


def item_to_id(col, lexemes: bool = False):
    """Column expr: 'Q72' → 72L, non-items → null. JVM-side (F3).

    ``lexemes=True`` additionally maps 'L9' → 9 | lexeme-flag bit, the
    packed form the reference carries through page_items
    (util.go:32-60; page_items.go:140-149). Default stays Q-only — the
    signal pipelines are Q-item-ranked, like the reference's
    (pagesignals.go:161-163)."""
    q = F.when(col.rlike(r"^Q\d+$"), F.substring(col, 2, 20).cast("long"))
    if not lexemes:
        return q.otherwise(F.lit(None).cast("long"))
    return q.when(
        col.rlike(r"^L\d+$"),
        F.substring(col, 2, 20).cast("long").bitwiseOR(F.lit(_LEXEME_FLAG)),
    ).otherwise(F.lit(None).cast("long"))


def id_to_item(col, lexemes: bool = False):
    """Column expr: 72L → 'Q72'; with ``lexemes=True``, flag-bit ids
    render as 'L<n>' (Item.String(), util.go:53-60)."""
    if not lexemes:
        return F.concat(F.lit("Q"), col.cast("string"))
    flag = F.lit(_LEXEME_FLAG)
    return F.when(
        col.bitwiseAND(flag) != 0,
        F.concat(F.lit("L"), col.bitwiseAND(~_LEXEME_FLAG).cast("string")),
    ).otherwise(F.concat(F.lit("Q"), col.cast("string")))


def decode_domain(col):
    """Column expr: 'gro.aidepikiw.mr.' → 'rm.wikipedia.org'
    (wikisites.go:197-204): strip trailing dot, reverse."""
    return F.reverse(F.regexp_replace(col, r"\.$", ""))


def parse_iso_week(s: str) -> tuple[int, int]:
    """'2023-W07' → (2023, 7) (util.go:410-420 ParseISOWeek)."""
    import re as _re

    m = _re.match(r"^(\d{4})-W(\d{2})$", s or "")
    if not m:
        raise ValueError(f"not an ISO week: {s!r}")
    return int(m.group(1)), int(m.group(2))


def iso_week_start(year: int, week: int):
    """Monday of the given ISO week (util.go:423-435 ISOWeekStart)."""
    from datetime import date as _date

    return _date.fromisocalendar(year, week, 1)
