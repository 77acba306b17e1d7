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
