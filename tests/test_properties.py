"""Property-based tests (hypothesis) for the pure kernels."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from wikidata_qrank_spark.functions.normalize import (
    format_page_key,
    normalize_title,
    parse_item,
)
from wikidata_qrank_spark.operators.stats import build_stats_from_rows

lang = st.sampled_from(["en", "de", "als", "tr", "az", "simple", "zh_min_nan", ""])
title = st.text(min_size=0, max_size=40)


@given(lang, title)
@settings(max_examples=200)
def test_page_key_shape_and_idempotence(lg, ti):
    key = format_page_key(lg, "wikipedia", ti)
    # shape: lang.site/title with exactly one '/' separator position
    assert "." in key.split("/", 1)[0]
    head, _, tail = key.partition("/")
    # no whitespace/control chars survive in the title part
    assert all(ch > "\x20" for ch in tail)
    # normalization is idempotent
    assert normalize_title(tail) == tail


@given(st.integers(min_value=0, max_value=10**12))
def test_parse_item_roundtrip(n):
    assert parse_item(f"Q{n}") == n


@given(st.text(alphabet="QLX0123456789abc", max_size=8))
def test_parse_item_never_crashes(s):
    out = parse_item(s)
    assert out is None or out >= 0


@given(
    st.lists(
        st.integers(min_value=1, max_value=10**9), min_size=1, max_size=60
    ),
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=1, max_value=20),
)
@settings(max_examples=100)
def test_stats_invariants(values, top_n, num_samples):
    values = sorted(values, reverse=True)
    rows = [(f"Q{i+1}", v) for i, v in enumerate(values)]
    stats = build_stats_from_rows(rows, len(rows), top_n, num_samples)
    samples = stats["Samples"]
    # last sample is always the minimum-value row
    assert samples[-1][2] == values[-1]
    # ranks strictly increasing, ids consistent
    ranks = [s[1] for s in samples]
    assert ranks == sorted(set(ranks))
    # top_n prefix present when enough rows
    for i in range(min(top_n, len(rows)) - 1):
        assert samples[i][1] == i + 1
    # median index within bounds
    assert 0 <= stats["Median"] <= len(samples)


# ---- SQL-dump lexer/parser roundtrip ------------------------------------

_sql_int = st.integers(min_value=-(10**12), max_value=10**12)
_sql_float = st.floats(
    allow_nan=False, allow_infinity=False, min_value=0.001, max_value=10**6
).map(lambda f: round(f, 3))
# strings without backslashes (the reference keeps non-quote escapes
# escaped, so backslash round-trips are intentionally not identity);
# single quotes exercise the \' escape path
_sql_str = st.text(
    alphabet=st.characters(
        blacklist_characters="\\", blacklist_categories=("Cs",)
    ),
    max_size=24,
)
_sql_value = st.one_of(
    _sql_int.map(lambda v: ("num", str(v))),
    _sql_float.map(lambda v: ("num", repr(v))),
    _sql_str.map(lambda v: ("str", v)),
    st.just(("null", "")),
)


def _render_value(kind: str, v: str) -> str:
    if kind == "num":
        return v
    if kind == "null":
        return "NULL"
    return "'" + v.replace("'", r"\'") + "'"


@given(
    st.lists(
        st.lists(_sql_value, min_size=3, max_size=3), min_size=0, max_size=8
    ),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=120, deadline=None)
def test_sql_dump_roundtrip(rows, per_stmt):
    """Render arbitrary tuples as a MediaWiki-style dump (multiple
    INSERT statements, comments, NULLs, escaped quotes) → parse →
    identical values. Mirrors the tuple grammar of sqlreader.go."""
    from wikidata_qrank_spark.sources.sqldump import parse_sql_dump

    header = (
        "-- dump comment\n"
        "CREATE TABLE `t` (\n"
        "  `a` int(10) unsigned NOT NULL,\n"
        "  `b` varbinary(60) NOT NULL DEFAULT '',\n"
        "  `c` blob NOT NULL,\n"
        "  PRIMARY KEY (`a`)\n"
        ") ENGINE=InnoDB DEFAULT CHARSET=binary;\n"
    )
    stmts = []
    for i in range(0, len(rows), per_stmt):
        chunk = rows[i : i + per_stmt]
        tuples = ",".join(
            "(" + ",".join(_render_value(k, v) for k, v in row) + ")"
            for row in chunk
        )
        stmts.append(f"INSERT INTO `t` VALUES {tuples};")
    cols, parsed = parse_sql_dump(header + "\n".join(stmts))
    assert cols == ["a", "b", "c"]
    want = [[v for _, v in row] for row in rows]
    assert parsed == want


# ---- round-5 integer-exact kernels: pure-math properties ----

import hashlib


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=30,
    unique=True,
)


@given(edge_lists)
@settings(max_examples=60)
def test_transe_step_loss_never_increases(pairs):
    """The TransE update rule (hash-lattice init, integer micro
    gradients, floor-division lr=1/100) never increases the squared
    translation loss on bounded-degree graphs — the stability property
    the operator's bit-exact pytest assumes. Pure replica of the
    documented recurrence (graph.py transe_step)."""
    dim, denom = 4, 100
    nodes = {a for a, _ in pairs} | {b for _, b in pairs}
    emb = {(v, d): (_h60(f"{v}|{d}") % 2001 - 1000) * 1000
           for v in nodes for d in range(dim)}
    rel = {d: (_h60(f"r|{d}") % 2001 - 1000) * 1000 for d in range(dim)}

    def loss(e):
        return sum((e[(h, d)] + rel[d] - e[(t, d)]) ** 2
                   for h, t in pairs for d in range(dim))

    grad = {k: 0 for k in emb}
    for h, t in pairs:
        for d in range(dim):
            diff = emb[(h, d)] + rel[d] - emb[(t, d)]
            grad[(h, d)] += 2 * diff
            grad[(t, d)] -= 2 * diff
    emb1 = {k: emb[k] - grad[k] // denom for k in emb}
    assert loss(emb1) <= loss(emb)


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
             max_size=80),
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
             max_size=80),
)
@settings(max_examples=60)
def test_hll_register_merge_law(xs, ys):
    """Mergeability, the law every HLL composition in the repo leans
    on (two_hop_approx, neighborhood_function, hll_window_rollup):
    registers(A ∪ B) == elementwise max(registers(A), registers(B)).
    Pure replica of the portable md5 register rule (sketches.py:
    bucket = top 12 of 60 bits, rho = 49 − bitlength of remainder)."""
    bits, rem_bits = 12, 48
    mask = (1 << rem_bits) - 1

    def regs(vals):
        out: dict[int, int] = {}
        for v in vals:
            h = _h60(str(v))
            b, r = h >> rem_bits, h & mask
            rho = rem_bits + 1 if r == 0 else rem_bits + 1 - r.bit_length()
            out[b] = max(out.get(b, 0), rho)
        return out

    ra, rb, ru = regs(xs), regs(ys), regs(xs + ys)
    merged = dict(ra)
    for b, m in rb.items():
        merged[b] = max(merged.get(b, 0), m)
    assert merged == ru


@given(
    st.lists(st.integers(min_value=1, max_value=8), min_size=1,
             max_size=60),
    st.integers(min_value=8, max_value=64),
)
@settings(max_examples=80)
def test_sequence_packing_rule_invariants(lengths, budget):
    """Contiguous packing invariants for PRE-CHUNKED inputs (every doc
    ≤ budget — the operator's documented precondition for contiguous
    bin ids; an over-budget doc occupies several budget slots and the
    ids skip): bin ids contiguous from 0, total fill preserved, and
    every non-final bin holds ≥ budget − (max_len − 1) tokens."""
    docs = sorted(
        ((ln, i) for i, ln in enumerate(lengths)),
        key=lambda p: (-p[0], p[1]),
    )
    cum = 0
    bins: dict[int, int] = {}
    for ln, _ in docs:
        b = cum // budget
        bins[b] = bins.get(b, 0) + ln
        cum += ln
    assert sorted(bins) == list(range(len(bins)))
    assert sum(bins.values()) == sum(lengths)
    max_len = max(lengths)
    for b, fill in bins.items():
        if b != max(bins):
            assert fill >= budget - (max_len - 1)
