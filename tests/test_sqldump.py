"""SQL-dump reader goldens — reproduces the reference's
sqlreader_test.go:57-208 behaviors (column extraction, multi-INSERT,
empty table, escapes, comments, NULL→'') plus the distributed Spark
read and the page_props → page_items path with Q/L lexeme parity."""

from __future__ import annotations

import gzip

import pytest

from wikidata_qrank_spark.functions.normalize import _LEXEME_FLAG
from wikidata_qrank_spark.sources.sqldump import (
    SQLDumpParseError,
    lex_sql,
    page_items_from_page_props,
    parse_sql_dump,
    read_sql_dump,
    read_sql_dump_whole,
)

PAGE_PROPS_SQL = """\
-- MySQL dump 10.19  Distrib 10.3.38-MariaDB
--
-- Table structure for table `page_props`
--

DROP TABLE IF EXISTS `page_props`;
/*!40101 SET @saved_cs_client     = @@character_set_client */;
CREATE TABLE `page_props` (
  `pp_page` int(10) unsigned NOT NULL,
  `pp_propname` varbinary(60) NOT NULL DEFAULT '',
  `pp_value` blob NOT NULL,
  `pp_sortkey` float DEFAULT NULL,
  PRIMARY KEY (`pp_page`,`pp_propname`),
  UNIQUE KEY `pp_propname_page` (`pp_propname`,`pp_page`),
  UNIQUE KEY `pp_propname_sortkey_page` (`pp_propname`,`pp_sortkey`,`pp_page`)
) ENGINE=InnoDB DEFAULT CHARSET=binary;

INSERT INTO `page_props` VALUES (1,'wikibase_item','Q5296',NULL),(799,'page_image_free','Karte_Gemeinde_Zürich_2007.png',NULL),(799,'wikibase_item','Q72',NULL),(3824,'page_image_free','Karte_Gemeinde_Obergesteln_2007.png',NULL),(3824,'wikibase_item','Q662541',NULL),(14564,'unexpectedUnconnectedPage',-10,-10);
"""

WANT_ROWS = [
    ["1", "wikibase_item", "Q5296", ""],
    ["799", "page_image_free", "Karte_Gemeinde_Zürich_2007.png", ""],
    ["799", "wikibase_item", "Q72", ""],
    ["3824", "page_image_free", "Karte_Gemeinde_Obergesteln_2007.png", ""],
    ["3824", "wikibase_item", "Q662541", ""],
    ["14564", "unexpectedUnconnectedPage", "-10", "-10"],
]

EMPTY_TABLE_SQL = """\
-- loginwiki-like dump: table created, no data inserted
CREATE TABLE `page_props` (
  `pp_page` int(10) unsigned NOT NULL,
  `pp_propname` varbinary(60) NOT NULL DEFAULT '',
  `pp_value` blob NOT NULL,
  `pp_sortkey` float DEFAULT NULL,
  PRIMARY KEY (`pp_page`,`pp_propname`)
) ENGINE=InnoDB DEFAULT CHARSET=binary;
"""

MULTI_INSERT_SQL = """\
CREATE TABLE `page_props` (
  `pp_page` int(10) unsigned NOT NULL,
  `pp_propname` varbinary(60) NOT NULL DEFAULT '',
  `pp_value` blob NOT NULL,
  `pp_sortkey` float DEFAULT NULL,
  PRIMARY KEY (`pp_page`,`pp_propname`)
) ENGINE=InnoDB;
INSERT INTO `page_props` VALUES (1,'wikibase_item','Q1',NULL),(2,'wikibase_item','Q2',NULL);
INSERT INTO `page_props` VALUES (3,'wikibase_item','Q3',NULL);

INSERT INTO `page_props` VALUES (4,'wikibase_item','Q4',NULL);
"""


def _lex_debug(s: str) -> str:
    names = {
        "word": "Word",
        "name": "Name",
        "number": "Number",
        "text": "Text",
        "comment": "Comment",
        "(": "LeftParen",
        ")": "RightParen",
        ",": "Comma",
        ";": "Semicolon",
        "-": "Minus",
        "/": "Slash",
        "unexpected": "Unexpected",
    }
    out = []
    for kind, txt in lex_sql(s):
        tok = names[kind]
        out.append(f"{tok}[{txt}]" if txt else tok)
    return " ".join(out)


@pytest.mark.parametrize(
    "inp,want",
    [
        ("", ""),
        (" ", ""),
        ("✱", "Unexpected[✱]"),
        ("-- MySQL dump 10.19\n", "Comment[MySQL dump 10.19]"),
        (" ABC\nNULL ", "Word[ABC] Word[NULL]"),
        (
            "DROP TABLE `page_props`;",
            "Word[DROP] Word[TABLE] Name[page_props] Semicolon",
        ),
        ("-", "Minus"),
        ("-A", "Minus Word[A]"),
        ("- A", "Minus Word[A]"),
        ("42", "Number[42]"),
        ("0.1", "Number[0.1]"),
        (".7, -42, 1.8", "Number[.7] Comma Number[-42] Comma Number[1.8]"),
        ("- 42", "Minus Number[42]"),
        ("int(10)", "Word[int] LeftParen Number[10] RightParen"),
        ("'foo'", "Text[foo]"),
        (r"'fo\'o'", "Text[fo'o]"),
        (r"'ba\327r'", r"Text[ba\327r]"),  # numeric escapes stay escaped
        ("/", "Slash"),
        ("2/3", "Number[2] Slash Number[3]"),
        ("/* foo */", "Comment[foo]"),
    ],
)
def test_lexer_golden(inp, want):
    assert _lex_debug(inp) == want


def test_parse_page_props_dump():
    cols, rows = parse_sql_dump(PAGE_PROPS_SQL)
    assert cols == ["pp_page", "pp_propname", "pp_value", "pp_sortkey"]
    assert rows == WANT_ROWS


def test_parse_empty_table():
    cols, rows = parse_sql_dump(EMPTY_TABLE_SQL)
    assert cols == ["pp_page", "pp_propname", "pp_value", "pp_sortkey"]
    assert rows == []


def test_parse_multiple_inserts():
    cols, rows = parse_sql_dump(MULTI_INSERT_SQL)
    assert [r[:3] for r in rows] == [
        ["1", "wikibase_item", "Q1"],
        ["2", "wikibase_item", "Q2"],
        ["3", "wikibase_item", "Q3"],
        ["4", "wikibase_item", "Q4"],
    ]


def test_parse_error_on_junk_values():
    with pytest.raises(SQLDumpParseError):
        list(
            parse_sql_dump(
                "CREATE TABLE `t` (`a` int);\nINSERT INTO `t` VALUES (DROP);"
            )
        )


def test_parse_error_on_truncated_values():
    """EOF inside an open VALUES statement must raise, not silently drop
    the statement's remaining tuples (e.g. a multi-line INSERT read
    line-by-line, or a truncated dump)."""
    from wikidata_qrank_spark.sources.sqldump import iter_insert_rows, lex_sql

    # ends right after a closing ')' with the statement still open
    with pytest.raises(SQLDumpParseError, match="unterminated VALUES"):
        list(iter_insert_rows(lex_sql("INSERT INTO `t` VALUES (1,'a')")))
    # ends mid-tuple
    with pytest.raises(SQLDumpParseError):
        list(iter_insert_rows(lex_sql("INSERT INTO `t` VALUES (1,'a'),(2,")))


def test_read_sql_dump_distributed(spark, tmp_path):
    p = tmp_path / "rmwiki-page_props.sql"
    p.write_text(PAGE_PROPS_SQL, encoding="utf-8")
    df = read_sql_dump(spark, str(p))
    assert df.columns == ["pp_page", "pp_propname", "pp_value", "pp_sortkey"]
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(tuple(r) for r in WANT_ROWS)


def test_read_sql_dump_gz_and_whole_agree(spark, tmp_path):
    p = tmp_path / "rmwiki-page_props.sql.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write(PAGE_PROPS_SQL)
    a = sorted(tuple(r) for r in read_sql_dump(spark, str(p)).collect())
    b = sorted(tuple(r) for r in read_sql_dump_whole(spark, str(p)).collect())
    assert a == b == sorted(tuple(r) for r in WANT_ROWS)


LEXEME_PROPS_SQL = """\
CREATE TABLE `page_props` (
  `pp_page` int(10) unsigned NOT NULL,
  `pp_propname` varbinary(60) NOT NULL,
  `pp_value` blob NOT NULL,
  `pp_sortkey` float DEFAULT NULL
) ENGINE=InnoDB;
INSERT INTO `page_props` VALUES (1,'wikibase_item','Q72',NULL),(2,'wikibase_item','L9',NULL),(3,'wikibase_item','Q5',NULL),(4,'displaytitle','x',NULL),(5,'wikibase_item','junk',NULL);
"""


def test_page_items_carries_lexemes(spark, tmp_path):
    """Mixed Q/L page_items with the packed lexeme flag bit
    (page_items.go:140-149, util.go:32-60)."""
    p = tmp_path / "wikidatawiki-page_props.sql"
    p.write_text(LEXEME_PROPS_SQL, encoding="utf-8")
    pi = page_items_from_page_props(read_sql_dump(spark, str(p)))
    got = {r.page_id: (r.item, r.item_id) for r in pi.collect()}
    assert got == {
        1: ("Q72", 72),
        2: ("L9", 9 | _LEXEME_FLAG),
        3: ("Q5", 5),
    }  # non-wikibase rows and junk values dropped


def test_id_to_item_lexeme_roundtrip(spark):
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.functions.normalize import id_to_item, item_to_id

    df = spark.createDataFrame(
        [("Q72",), ("L9",), ("Q5",)], "item string"
    ).withColumn("item_id", item_to_id(F.col("item"), lexemes=True))
    back = df.withColumn("item2", id_to_item(F.col("item_id"), lexemes=True))
    assert all(r.item == r.item2 for r in back.collect())


PAGELINKS_SQL = """\
CREATE TABLE `pagelinks` (
  `pl_from` int(8) unsigned NOT NULL DEFAULT 0,
  `pl_namespace` int(11) NOT NULL DEFAULT 0,
  `pl_title` varbinary(255) NOT NULL DEFAULT ''
) ENGINE=InnoDB;
INSERT INTO `pagelinks` VALUES (1,0,'Zurich'),(1,0,'Bern'),(3,0,'Zurich'),(3,4,'About'),(1,0,'Nowhere');
"""


def test_wiki_links_end_to_end_from_sql_dumps(spark, tmp_path):
    """The J7 links operator fed straight from .sql fixtures — the
    ingestion gap the reference covers with sqlreader.go."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.wiki import links_from_pagelinks

    props = tmp_path / "page_props.sql"
    props.write_text(
        """\
CREATE TABLE `page_props` (
  `pp_page` int(10) unsigned NOT NULL,
  `pp_propname` varbinary(60) NOT NULL,
  `pp_value` blob NOT NULL,
  `pp_sortkey` float DEFAULT NULL
) ENGINE=InnoDB;
INSERT INTO `page_props` VALUES (1,'wikibase_item','Q100',NULL),(3,'wikibase_item','Q300',NULL);
""",
        encoding="utf-8",
    )
    links = tmp_path / "pagelinks.sql"
    links.write_text(PAGELINKS_SQL, encoding="utf-8")

    page_items = page_items_from_page_props(read_sql_dump(spark, str(props))).select(
        "page_id", "item_id"
    )
    pagelinks = read_sql_dump(spark, str(links)).select(
        F.col("pl_from").cast("long").alias("from_page"),
        F.col("pl_namespace").cast("int").alias("namespace"),
        F.col("pl_title").alias("title"),
    )
    targets = spark.createDataFrame(
        [("Zurich", 72), ("Bern", 70), ("NS:About", 300)],
        "title string, item_id long",
    )
    namespaces = spark.createDataFrame([(0, ""), (4, "NS")], "ns_id int, localized string")
    edges = links_from_pagelinks(
        page_items, targets, namespaces, pagelinks_a=pagelinks
    )
    got = sorted((r.src_id, r.dst_id) for r in edges.collect())
    # page 1 (Q100) → Zurich(72), Bern(70); page 3 (Q300) → Zurich(72);
    # ns-4 'About' resolves via prefix to item 300 = self-loop → dropped;
    # 'Nowhere' unresolvable → dropped
    assert got == [(100, 70), (100, 72), (300, 72)]


REDIRECT_SQL = """\
CREATE TABLE `redirect` (
  `rd_from` int(8) unsigned NOT NULL DEFAULT 0,
  `rd_namespace` int(11) NOT NULL DEFAULT 0,
  `rd_title` varbinary(255) NOT NULL DEFAULT '',
  `rd_interwiki` varbinary(32) DEFAULT NULL,
  `rd_fragment` varbinary(255) DEFAULT NULL
) ENGINE=InnoDB;
INSERT INTO `redirect` VALUES (10,0,'Zurich',NULL,NULL),(11,0,'Geneva','','Section'),(12,0,'Bern','wikt',NULL),(13,4,'Policy',NULL,NULL);
"""


def test_redirect_targets_drops_interwiki(spark, tmp_path):
    """P6 (titles.go:287-293): rd_interwiki non-empty → dropped; ns
    prefixing applied; SQL-dump NULL ('') and '' both pass."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.wiki import redirect_targets

    p = tmp_path / "redirect.sql"
    p.write_text(REDIRECT_SQL, encoding="utf-8")
    rdf = read_sql_dump(spark, str(p))
    namespaces = spark.createDataFrame(
        [(0, ""), (4, "NS")], "ns_id int, localized string"
    )
    got = {
        (r.from_page, r.title) for r in redirect_targets(rdf, namespaces).collect()
    }
    # 12 is an interwiki redirect (wikt) → dropped; 13 gets the prefix
    assert got == {(10, "Zurich"), (11, "Geneva"), (13, "NS:Policy")}


ENUM_TABLE_SQL = """\
CREATE TABLE `categorylinks` (
  `cl_from` int(8) unsigned NOT NULL DEFAULT 0,
  `cl_to` varbinary(255) NOT NULL DEFAULT '',
  `cl_type` enum('page','subcat','file') NOT NULL DEFAULT 'page',
  `cl_sortkey` varbinary(230) NOT NULL DEFAULT '',
  PRIMARY KEY (`cl_from`,`cl_to`)
) ENGINE=InnoDB;
INSERT INTO `categorylinks` VALUES (1,'Cities','page','CITIES'),(2,'Rivers','subcat','RIVERS');
"""


def test_parse_enum_column_types():
    """Commas inside parenthesized types (enum/decimal) must not end the
    column list — a real categorylinks-shaped dump (the Go reference's
    skipUntilEither has this bug; we deviate deliberately)."""
    cols, rows = parse_sql_dump(ENUM_TABLE_SQL)
    assert cols == ["cl_from", "cl_to", "cl_type", "cl_sortkey"]
    assert rows == [
        ["1", "Cities", "page", "CITIES"],
        ["2", "Rivers", "subcat", "RIVERS"],
    ]
