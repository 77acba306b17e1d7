"""MediaWiki SQL-dump reader (SURVEY §2 S5).

Reference parity: cmd/qrank-builder/sqlreader.go:30-177 (parser) and
196-398 (lexer); behavior goldens from sqlreader_test.go:57-208 —
CREATE-TABLE column extraction, multi-row and multi-statement INSERTs,
empty tables (loginwiki), backslash escapes (``\\'`` unescaped, numeric
escapes like ``\\327`` kept escaped), ``--`` and ``/* */`` comments,
NULL → empty string.

Spark-first shape
-----------------
Wikimedia dumps put every INSERT statement on a single line, so the
body parses **distributed**: ``spark.read.text`` → filter INSERT lines
→ ``mapPartitions`` running the tuple lexer per line. The CREATE TABLE
header (a few KB at the top of the file) is read once on the driver for
the column names. Per-file parallelism comes from Spark's text source
(for ``.gz`` dumps each file is one task — same sequential decompress
the reference does; a dump *directory* of hundreds of wikis fans out
file-per-task). A whole-text fallback handles non-line-oriented dumps.

The lexer below is a from-scratch Python implementation of the same
token grammar; it is the justified-Python path (a SQL tuple lexer has
no Catalyst equivalent) and runs once per ingest, off the hot path.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

# token kinds
_UNEXPECTED = "unexpected"
_WORD = "word"
_NAME = "name"
_NUMBER = "number"
_TEXT = "text"
_COMMENT = "comment"
_LPAREN = "("
_RPAREN = ")"
_COMMA = ","
_SEMI = ";"
_MINUS = "-"
_SLASH = "/"

_HEADER_PROBE_BYTES = 256 * 1024


class SQLDumpParseError(ValueError):
    pass


def _is_word_char(c: str) -> bool:
    return ("A" <= c <= "Z") or ("a" <= c <= "z")


def _is_number_start(c: str) -> bool:
    return c.isdigit() or c == "."


def lex_sql(s: str) -> Iterator[tuple[str, str]]:
    """Token stream over a SQL-dump fragment (sqlreader.go:196-398)."""
    i, n = 0, len(s)
    while True:
        while i < n and s[i].isspace():
            i += 1
        if i >= n:
            return
        c = s[i]
        if c == "`":
            j = s.find("`", i + 1)
            j = n if j < 0 else j
            yield _NAME, s[i + 1 : j]
            i = j + 1
        elif c == "-":
            if i + 1 < n and s[i + 1] == "-":
                j = s.find("\n", i)
                j = n if j < 0 else j
                yield _COMMENT, s[i + 2 : j].strip()
                i = j + 1
            elif i + 1 < n and _is_number_start(s[i + 1]):
                i, txt = _read_number(s, i)
                yield _NUMBER, txt
            else:
                yield _MINUS, ""
                i += 1
        elif c == "'":
            buf = []
            i += 1
            while i < n:
                ch = s[i]
                if ch == "'":
                    i += 1
                    break
                if ch == "\\" and i + 1 < n:
                    nxt = s[i + 1]
                    if nxt == "'":
                        buf.append("'")
                    else:
                        # numeric escapes like \327 stay escaped
                        # (sqlreader.go:313-327)
                        buf.append("\\")
                        buf.append(nxt)
                    i += 2
                    continue
                buf.append(ch)
                i += 1
            yield _TEXT, "".join(buf)
        elif c == "/":
            if i + 1 < n and s[i + 1] == "*":
                j = s.find("*/", i + 2)
                if j < 0:
                    body, i = s[i + 2 :], n
                    body = body.rstrip().rstrip("*").strip()
                else:
                    body, i = s[i + 2 : j].strip(), j + 2
                yield _COMMENT, body
            else:
                yield _SLASH, ""
                i += 1
        elif c in "(),;":
            yield {"(": _LPAREN, ")": _RPAREN, ",": _COMMA, ";": _SEMI}[c], ""
            i += 1
        elif _is_word_char(c):
            j = i + 1
            while j < n and _is_word_char(s[j]):
                j += 1
            yield _WORD, s[i:j]
            i = j
        elif _is_number_start(c):
            i, txt = _read_number(s, i)
            yield _NUMBER, txt
        else:
            yield _UNEXPECTED, c
            i += 1


def _read_number(s: str, i: int) -> tuple[int, str]:
    start = i
    got_dot = False
    if s[i] == "-":
        i += 1
    if s[i] == ".":
        got_dot = True
        i += 1
    while i < len(s):
        c = s[i]
        if c == "." and not got_dot:
            got_dot = True
            i += 1
        elif c.isdigit():
            i += 1
        else:
            break
    return i, s[start:i]


def _tokens_no_comments(toks: Iterable[tuple[str, str]]) -> Iterator[tuple[str, str]]:
    for kind, txt in toks:
        if kind != _COMMENT:
            yield kind, txt


def parse_create_columns(toks: Iterator[tuple[str, str]]) -> list[str]:
    """Column names from CREATE TABLE (sqlreader.go:69-86): consume the
    token stream up to and including the statement's closing ';'."""
    for kind, txt in toks:
        if kind == _WORD and txt == "CREATE":
            break
    else:
        raise SQLDumpParseError("no CREATE TABLE statement")
    for kind, _ in toks:
        if kind == _LPAREN:
            break
    else:
        raise SQLDumpParseError("CREATE without column list")
    columns: list[str] = []
    while True:
        try:
            kind, txt = next(toks)
        except StopIteration as exc:
            raise SQLDumpParseError("unterminated CREATE TABLE") from exc
        if kind != _NAME:
            # first non-name entry (PRIMARY KEY, UNIQUE KEY, …): skip to ';'
            for kind2, _ in toks:
                if kind2 == _SEMI:
                    return columns
            return columns
        columns.append(txt)
        # Skip the column definition up to the NEXT top-level ',' or the
        # closing ')'. Deviation from sqlreader.go:147-166: the reference
        # also returns on a comma INSIDE parens, which truncates the
        # column list on enum('a','b')/decimal(10,2) types (real
        # MediaWiki categorylinks/image tables); here commas only
        # terminate at depth 0.
        depth = 0
        for kind2, _ in toks:
            if kind2 == _LPAREN:
                depth += 1
            elif kind2 == _RPAREN and depth > 0:
                depth -= 1
            elif (kind2 == _COMMA and depth == 0) or (
                kind2 == _RPAREN and depth == 0
            ):
                break


def iter_insert_rows(toks: Iterator[tuple[str, str]]) -> Iterator[list[str]]:
    """Value tuples from every INSERT … VALUES statement in the stream
    (sqlreader.go:49-134). NULL → '' like the reference."""
    toks = _tokens_no_comments(toks)
    while True:
        for kind, txt in toks:
            if kind == _WORD and txt == "INSERT":
                break
        else:
            return
        for kind, txt in toks:
            if kind == _WORD and txt == "VALUES":
                break
        else:
            return
        # tuples separated by ',', statement ended by ';'
        statement_open = True
        while statement_open:
            kind, txt = next(toks, (None, None))
            if kind != _LPAREN:
                raise SQLDumpParseError(f"expected '(' in VALUES, got {kind}")
            row: list[str] = []
            while True:
                kind, txt = next(toks, (None, None))
                if kind in (_NUMBER, _TEXT):
                    row.append(txt)
                elif kind == _WORD and txt == "NULL":
                    row.append("")
                else:
                    raise SQLDumpParseError(f"unexpected value token {kind}")
                kind, txt = next(toks, (None, None))
                if kind == _COMMA:
                    continue
                if kind == _RPAREN:
                    break
                raise SQLDumpParseError(f"expected ',' or ')', got {kind}")
            yield row
            kind, txt = next(toks, (None, None))
            if kind == _COMMA:
                continue
            if kind == _SEMI:
                statement_open = False
            elif kind is None:
                # EOF with the VALUES statement still open: the input was
                # truncated (or the INSERT spans input units, e.g. lines
                # in the line-parallel scan). Returning silently here
                # would drop every remaining tuple of the statement —
                # fail loudly so callers switch to read_sql_dump_whole.
                raise SQLDumpParseError(
                    "EOF inside an unterminated VALUES statement "
                    "(truncated input, or a multi-line INSERT read "
                    "line-by-line — use read_sql_dump_whole)"
                )
            else:
                raise SQLDumpParseError(f"expected ',' or ';', got {kind}")


def parse_sql_dump(text: str) -> tuple[list[str], list[list[str]]]:
    """Whole-dump kernel: (columns, rows). Mirrors NewSQLReader + Read."""
    columns = parse_create_columns(_tokens_no_comments(lex_sql(text)))
    rows = list(iter_insert_rows(lex_sql(text)))
    for row in rows:
        if len(row) != len(columns):
            raise SQLDumpParseError(
                f"row arity {len(row)} != {len(columns)} columns"
            )
    return columns, rows


def _open_maybe_gz(path: str) -> io.TextIOBase:
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="utf-8")
    return open(path, encoding="utf-8")


def read_dump_columns(path: str) -> list[str]:
    """CREATE TABLE column names from the dump header — one small driver
    read (the header precedes all data; reference reads it the same way,
    sqlreader.go:29-43)."""
    with _open_maybe_gz(path) as f:
        head = f.read(_HEADER_PROBE_BYTES)
    return parse_create_columns(_tokens_no_comments(lex_sql(head)))


def read_sql_dump(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Distributed SQL-dump scan → DataFrame of string columns.

    INSERT statements are line-oriented in Wikimedia dumps, so each
    line parses independently inside ``mapPartitions`` — no single-task
    stage over the body. Pass ``columns`` to skip the driver header
    probe (e.g. reading a glob of per-wiki dumps with a known schema).

    Non-line-oriented SQL (an INSERT spanning lines) fails loudly with
    :class:`SQLDumpParseError` ("EOF inside an unterminated VALUES
    statement") rather than silently truncating — switch to
    :func:`read_sql_dump_whole` (one task per file) for such inputs.
    """
    cols = columns or read_dump_columns(path)
    ncols = len(cols)
    lines = spark.read.text(path)

    def parse_lines(rows: Iterator) -> Iterator[tuple]:
        for r in rows:
            line = r.value
            if not line.startswith("INSERT"):
                continue
            for row in iter_insert_rows(lex_sql(line)):
                if len(row) != ncols:
                    raise SQLDumpParseError(
                        f"row arity {len(row)} != {ncols} columns"
                    )
                yield tuple(row)

    schema = ", ".join(f"`{c}` string" for c in cols)
    return lines.rdd.mapPartitions(parse_lines).toDF(schema)


def read_sql_dump_whole(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Whole-file fallback (one task per file): handles INSERT statements
    spanning lines. Still parallel across files for a glob."""
    cols = columns or read_dump_columns(path)
    ncols = len(cols)
    whole = spark.read.text(path, wholetext=True)

    def parse_whole(rows: Iterator) -> Iterator[tuple]:
        for r in rows:
            for row in iter_insert_rows(lex_sql(r.value)):
                if len(row) != ncols:
                    raise SQLDumpParseError(
                        f"row arity {len(row)} != {ncols} columns"
                    )
                yield tuple(row)

    schema = ", ".join(f"`{c}` string" for c in cols)
    return whole.rdd.mapPartitions(parse_whole).toDF(schema)


def page_items_from_page_props(props_df: DataFrame) -> DataFrame:
    """(page_id, item_id, item) from a page_props dump — the
    readPageItemsFromPageProps path (page_items.go:140-180): keep
    pp_propname = 'wikibase_item', parse Q/L ids (lexemes carry the
    flag bit, util.go:32-60)."""
    from pyspark.sql import functions as F

    from ..functions.normalize import item_to_id

    return (
        props_df.filter(F.col("pp_propname") == "wikibase_item")
        .select(
            F.col("pp_page").cast("long").alias("page_id"),
            F.col("pp_value").alias("item"),
            item_to_id(F.col("pp_value"), lexemes=True).alias("item_id"),
        )
        .filter(F.col("item_id").isNotNull())
    )
