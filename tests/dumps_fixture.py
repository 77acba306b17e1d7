"""Generator for a toy Wikimedia dumps TREE — the input shape of the
reference's end-to-end TestBuild (cmd/qrank-builder/build_test.go:20-54
over testdata/dumps): six wikis with per-vintage SQL dumps, `latest`
symlinks, a metawiki sites table, and a week of daily pageview files.

The semantic rows are re-typed behavioral facts from the reference's
test inputs (the same way tests/test_golden_itemsignals.py re-types its
per-stage fixtures); the SQL text, layout and generator are original.
Writes into a caller-supplied directory (pytest tmp_path).
"""

from __future__ import annotations

import bz2
import gzip
import os

_SITES_COLS = (
    "`site_id` int, `site_global_key` varbinary(64), `site_type` varbinary(32), "
    "`site_group` varbinary(32), `site_source` varbinary(32), "
    "`site_language` varbinary(35), `site_protocol` varbinary(32), "
    "`site_domain` varchar(255), `site_data` blob, `site_forward` tinyint, "
    "`site_config` blob"
)

# (key, reversed-domain) — decode_domain('gro.aidepikiw.mr.') == 'rm.wikipedia.org'
_SITES = [
    ("rmwiki", "gro.aidepikiw.mr."),
    ("rmwikibooks", "gro.skoobikiw.mr."),
    ("itwikibooks", "gro.skoobikiw.ti."),
    ("wikidatawiki", "gro.atadikiw.www."),
    ("metawiki", "gro.aidemikiw.atem."),
    ("loginwiki", "gro.aidemikiw.nigol."),
    # a site row WITHOUT a dump directory: discovery must skip it
    ("enwiki", "gro.aidepikiw.ne."),
]

_PAGE_COLS = (
    "`page_id` int, `page_namespace` int, `page_title` varbinary(255), "
    "`page_is_redirect` tinyint, `page_is_new` tinyint, `page_random` double, "
    "`page_touched` binary(14), `page_links_updated` varbinary(14), "
    "`page_latest` int, `page_len` int, `page_content_model` varbinary(32), "
    "`page_lang` varbinary(35)"
)

_PROPS_COLS = (
    "`pp_page` int, `pp_propname` varbinary(60), `pp_value` blob, "
    "`pp_sortkey` float"
)

# page rows: (id, ns, title, len, content_model)
_PAGES = {
    "rmwiki": [
        (1, 4, "Pagina_principala", 2500, "wikitext"),
        (799, 0, "Turitg", 3142, "wikitext"),
        (811, 0, "Main_Page", 41, "wikitext"),
        (3824, 0, "Obergesteln", 4973, "wikitext"),
        (4108, 0, "Zürich", 20, "wikitext"),
        (6857, 2, "Username", 32, "wikitext"),
        (14564, 10, "Pajais_Federativ_Austria", 916, "wikitext"),
    ],
    "rmwikibooks": [(1, 0, "Pagina_principala", 1747, "wikitext")],
    "itwikibooks": [
        (54321, 0, "Allegra,_allegra", 23, "wikitext"),
        (54322, 0, "In_chaschiel_ed_ina_nursa", 24, "wikitext"),
        (123456, 0, "Categoria:Testi_in_romancio", 5678, "wikitext"),
    ],
    "wikidatawiki": [
        (1, 4, "Main_Page/Content", 3470, "wikitext"),
        (200, 0, "Q72", 830167, "wikibase-item"),
        (623646, 0, "Q662541", 29215, "wikibase-item"),
        (5411171, 0, "Q5649951", 25022, "wikibase-item"),
        (19441465, 4, "Main_Page", 372, "wikitext"),
    ],
    "loginwiki": [(1, 0, "Main_Page", 678, "wikitext")],
}

# page_props rows: (page, propname, value)
_PROPS = {
    "rmwiki": [
        (1, "wikibase_item", "Q5296"),
        (799, "page_image_free", "Karte_Gemeinde_Zürich_2007.png"),
        (799, "wikibase_item", "Q72"),
        (3824, "page_image_free", "Karte_Gemeinde_Obergesteln_2007.png"),
        (3824, "wikibase_item", "Q662541"),
        (14564, "unexpectedUnconnectedPage", "-10"),
    ],
    "rmwikibooks": [
        (1637, "wikibase_item", "Q4847311"),
        (1639, "unexpectedUnconnectedPage", "-14"),
    ],
    "itwikibooks": [
        (54321, "wikibase_item", "Q54321"),
        (54322, "wikibase_item", "Q54322"),
        (123456, "wikibase_item", "Q8681970"),
    ],
    "wikidatawiki": [
        (1, "translate-has-languages-tag", "1"),
        (1, "wikibase_item", "Q107661323"),
        (200, "kartographer_frames", "1"),
        (200, "page_image_free", "Zuerich_Fraumuenster_St_Peter.jpg"),
        (200, "wb-claims", "550"),
        (200, "wb-identifiers", "85"),
        (200, "wb-sitelinks", "186"),
        (623646, "wb-claims", "32"),
        (623646, "wb-identifiers", "9"),
        (623646, "wb-sitelinks", "15"),
        (5411171, "wb-claims", "1"),
        (5411171, "wb-identifiers", "0"),
        (5411171, "wb-sitelinks", "20"),
        (19441465, "wikibase_item", "Q5296"),
    ],
    "loginwiki": [],
}

_VINTAGE = {
    "rmwiki": "20240301",
    "rmwikibooks": "20240301",
    "itwikibooks": "20240301",
    "wikidatawiki": "20240401",
    "loginwiki": "20240501",
}

# daily pageview lines per date: "wiki title page_id platform count hourly"
# rm.wikipedia Obergesteln (page 3824) totals 3 over the week; everything
# else is either a foreign wiki (no dumps → dropped), a null page id, or
# a page without a wikidata item.
_PAGEVIEWS = {
    "20230320": [
        "de.wikipedia Obergesteln 585473 desktop 2 K1U1",
        "rm.wikipedia Datoteca:Obergesteln2.JPG null mobile-web 1 Q1",
        "rm.wikipedia Obergesteln 3824 desktop 1 O1",
    ],
    "20230321": [
        "en.wikipedia Obergesteln 7082401 desktop 2 C1W1",
        "rm.wikipedia Obergesteln 3824 desktop 1 B1",
    ],
    "20230322": [
        "rm.wikipedia Discussiun:Obergesteln 10117 desktop 1 E1",
        "rm.wikipedia Main_Page 811 desktop 0 X0",
    ],
    "20230323": ["fr.wikipedia Obergesteln 268776 desktop 1 Q1"],
    "20230324": ["rm.wikipedia Obergesteln 3824 desktop 1 T1"],
    "20230325": ["es.wikipedia Obergesteln 689814 mobile-web 2 Q1V1"],
    "20230326": ["it.wikipedia Obergesteln 110310 desktop 1 V1"],
    # an INCOMPLETE earlier week (one day only) — must be ignored
    "20230317": ["rm.wikipedia Obergesteln 3824 desktop 999 Z999"],
}

# The end-to-end golden this tree must produce (build_test.go:38-49).
EXPECTED_ITEM_SIGNALS = [
    "item,pageviews_52w,wikitext_bytes,claims,identifiers,sitelinks",
    "Q72,0,3142,550,85,186",
    "Q5296,0,2872,0,0,0",
    "Q54321,0,23,0,0,0",
    "Q54322,0,24,0,0,0",
    "Q662541,3,4973,32,9,15",
    "Q4847311,0,0,0,0,0",
    "Q5649951,0,0,1,0,20",
    "Q8681970,0,5678,0,0,0",
    "Q107661323,0,3470,0,0,0",
]


def _sql_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (int, float)):
        return str(v)
    escaped = str(v).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{escaped}'"


def _write_sql_gz(path: str, table: str, cols: str, rows: list[tuple]) -> None:
    lines = [f"CREATE TABLE `{table}` (\n  {cols}\n) ENGINE=InnoDB;"]
    if rows:
        tuples = ",".join(
            "(" + ",".join(_sql_value(v) for v in row) + ")" for row in rows
        )
        lines.append(f"INSERT INTO `{table}` VALUES {tuples};")
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


def write_dumps_tree(root) -> str:
    """Create the full tree under ``root``; returns the dumps dir."""
    dumps = os.path.join(str(root), "dumps")

    # metawiki: sites table only (no page/page_props → excluded from
    # the site list itself, like the reference tree)
    meta_dir = os.path.join(dumps, "metawiki", "20240401")
    os.makedirs(meta_dir)
    sites_rows = [
        (i + 1, key, "mediawiki", "wikipedia", "local", "xx", "https", dom,
         "a:0:{}", 0, "a:0:{}")
        for i, (key, dom) in enumerate(_SITES)
    ]
    sites_name = "metawiki-20240401-sites.sql.gz"
    _write_sql_gz(os.path.join(meta_dir, sites_name), "sites", _SITES_COLS, sites_rows)
    latest = os.path.join(dumps, "metawiki", "latest")
    os.makedirs(latest)
    os.symlink(
        os.path.join("..", "20240401", sites_name),
        os.path.join(latest, "metawiki-latest-sites.sql.gz"),
    )

    for key, ymd in _VINTAGE.items():
        d = os.path.join(dumps, key, ymd)
        os.makedirs(d)
        page_rows = [
            (pid, ns, title, 0, 0, 0.5, "20240101000000", "20240101000000",
             1000 + pid, length, model, None)
            for pid, ns, title, length, model in _PAGES[key]
        ]
        props_rows = [
            (pid, name, value, None) for pid, name, value in _PROPS[key]
        ]
        _write_sql_gz(
            os.path.join(d, f"{key}-{ymd}-page.sql.gz"), "page", _PAGE_COLS, page_rows
        )
        _write_sql_gz(
            os.path.join(d, f"{key}-{ymd}-page_props.sql.gz"),
            "page_props", _PROPS_COLS, props_rows,
        )
        latest = os.path.join(dumps, key, "latest")
        os.makedirs(latest)
        for table in ("page", "page_props"):
            os.symlink(
                os.path.join("..", ymd, f"{key}-{ymd}-{table}.sql.gz"),
                os.path.join(latest, f"{key}-latest-{table}.sql.gz"),
            )

    pv_dir = os.path.join(dumps, "other", "pageview_complete", "2023", "2023-03")
    os.makedirs(pv_dir)
    for ymd, lines in _PAGEVIEWS.items():
        with bz2.open(
            os.path.join(pv_dir, f"pageviews-{ymd}-user.bz2"), "wt", encoding="utf-8"
        ) as f:
            f.write("\n".join(lines) + "\n")
    return dumps
