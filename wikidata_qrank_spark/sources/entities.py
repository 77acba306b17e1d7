"""Wikidata entity-dump source — S3/S4 semantics.

The reference hand-parses each entity JSON line for ``id`` + sitelinks
at 21.9 µs/entity (entities.go:319-401) and splits the bz2 dump at
block boundaries for parallel scan (entities.go:52-149). In Spark both
are free: bz2 is a splittable Hadoop codec, and ``from_json`` with an
explicit 2-field schema gives column-pruned vectorized parsing — the
80-line byte scanner reduces to a schema literal.

Site-key split (entities.go:369-380): the key splits at the first
occurrence of ``wiki`` — ``be_x_oldwiki`` → (be_x_old, wikipedia),
``zh_classicalwikisource`` → (zh_classical, wikisource), bare ``wiki``
means ``wikipedia``; keys without ``wiki`` are dropped. Page keys then
go through the formatLine kernel (functions/normalize.py). Goldens:
entities_test.go:129-194.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import format_page_key, make_page_key_udf

ENTITY_SCHEMA = "id string, sitelinks map<string, struct<site string, title string>>"


def sitelinks_from_json(df: DataFrame, json_col: str = "value") -> DataFrame:
    """(page_key, item) from a DataFrame of entity JSON lines.

    The whole pipeline is map-only: parse → explode → split site key
    (JVM expressions) → normalize (Arrow kernel). Downstream sorts/joins
    decide partitioning.
    """
    parsed = df.select(F.from_json(F.col(json_col), ENTITY_SCHEMA).alias("e")).select(
        F.col("e.id").alias("item"), F.explode("e.sitelinks").alias("sitekey", "sl")
    )
    parsed = parsed.filter(F.col("item").rlike(r"^Q\d+$"))
    site = F.col("sl.site")
    wikipos = F.instr(site, "wiki")
    raw_site = F.expr("substring(sl.site, instr(sl.site, 'wiki'))")
    split = parsed.filter(wikipos > 0).select(
        "item",
        F.substring(site, 1, wikipos - 1).alias("lang"),
        F.when(raw_site == "wiki", F.lit("wikipedia")).otherwise(raw_site).alias("site"),
        F.col("sl.title").alias("title"),
    )
    key_udf = make_page_key_udf()
    return split.select(
        key_udf("lang", "site", "title").alias("page_key"), "item"
    )


def sitelinks_from_entity(entity_json: str) -> list[tuple[str, str]]:
    """Driver-side single-entity variant (unit-test / debugging parity
    with the reference's processEntity)."""
    import json

    e = json.loads(entity_json)
    item = e.get("id", "")
    out = []
    for sl in (e.get("sitelinks") or {}).values():
        site_key = sl.get("site", "")
        pos = site_key.find("wiki")
        if pos < 0:
            continue
        lang = site_key[:pos]
        site = site_key[pos:]
        if site == "wiki":
            site = "wikipedia"
        out.append((format_page_key(lang, site, sl.get("title", "")), item))
    return sorted(out)


def find_entities_dump(dumps_path: str) -> tuple["object", str]:
    """(dump_date, resolved_path) for the newest full entity dump —
    entities.go:26-45: follow the ``latest-all.json.bz2`` symlink under
    ``<dumps>/wikidatawiki/entities/``, take the date from the resolved
    path's parent directory, and return the RESOLVED path (not the
    symlink) so a dump rotation between discovery and open cannot race.
    """
    import os
    from datetime import date, datetime

    link = os.path.join(dumps_path, "wikidatawiki", "entities", "latest-all.json.bz2")
    resolved = os.path.realpath(link)
    if not os.path.exists(resolved):
        raise FileNotFoundError(link)
    parent = os.path.basename(os.path.dirname(resolved))
    dump_date: date = datetime.strptime(parent, "%Y%m%d").date()
    return dump_date, resolved
