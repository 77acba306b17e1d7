"""Exact n-gram span dedup (operators/spandedup.py) and
mixture-targeted resampling (operators/sampling.mixture_resample) —
hand-computed goldens plus fixture invariants."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from wikidata_qrank_spark.operators.sampling import mixture_resample
from wikidata_qrank_spark.operators.spandedup import duplicated_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_dedup_golden_merged_islands(spark):
    # shared 4-token passage "a b c d" inside both docs; n=3 →
    # every 3-gram of the passage duplicates; islands must merge to
    # one [start, start+4) span per doc.
    d = _docs(
        spark,
        [
            (1, "x a b c d y z q"),
            (2, "p q r a b c d w"),
        ],
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_spans(d, n=3, min_docs=2).collect()
    }
    assert got == {("1", 1, 5, 4), ("2", 3, 7, 4)}


def test_span_dedup_disjoint_islands_stay_split(spark):
    # two duplicated trigrams separated by a gap > 0 in doc 1 → two
    # spans, not one.
    d = _docs(
        spark,
        [
            (1, "a b c x x x x d e f"),
            (2, "a b c q q q q d e f"),
        ],
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(d, n=3, min_docs=2).collect()
    )
    assert got == [("1", 0, 3), ("1", 7, 10), ("2", 0, 3), ("2", 7, 10)]


def test_span_dedup_within_doc_repeat_not_cross_doc(spark):
    # a passage repeated INSIDE one doc but in no other doc does not
    # count (min_docs=2 is distinct-document support).
    d = _docs(spark, [(1, "a b c a b c"), (2, "x y z w v u")])
    assert duplicated_spans(d, n=3, min_docs=2).count() == 0


def test_span_dedup_boundary_no_wraparound(spark):
    # identical 2-token tail/head must not create grams across the
    # document boundary (lead is per-doc partition).
    d = _docs(spark, [(1, "u v a b"), (2, "a b u v")])
    # 2-grams: doc1 {u v, v a, a b}; doc2 {a b, b u, u v} → dups:
    # "u v" and "a b", at doc1 [0,2)+[2,4) (merged: offsets 0 and 2,
    # island since 2 <= 0+2 → merged [0,4)) and doc2 [0,2),[2,4) same.
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(d, n=2, min_docs=2).collect()
    )
    assert got == [("1", 0, 4), ("2", 0, 4)]


def test_span_dedup_rejects_bad_args(spark):
    d = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        duplicated_spans(d, n=1)
    with pytest.raises(ValueError):
        duplicated_spans(d, min_docs=1)


def test_span_dedup_partitioning_proof(spark, sf_dir):
    from wikidata_qrank_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, duplicated_spans(docs, n=8).collect()))
    b = sorted(map(tuple, duplicated_spans(docs.repartition(13), n=8).collect()))
    assert a == b and len(a) > 0
    # spans are valid intervals of >= n tokens
    for _, start, end, ntok in a:
        assert end - start == ntok >= 8


def test_mixture_resample_hits_target_shares(spark, sf_dir):
    from wikidata_qrank_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    targets = {"en": 400000, "de": 150000, "fr": 150000, "es": 150000, "zh": 150000}
    out = mixture_resample(docs, "lang", "doc_id", targets)
    counts = Counter(r["lang"] for r in out.select("lang").collect())
    total = sum(counts.values())
    assert total > 0
    # Bernoulli-by-hash is approximate: shares within 6 points of target
    for lang, t in targets.items():
        assert abs(counts[lang] / total - t / 1e6) < 0.06, (lang, counts)
    # never upsamples: kept <= available per stratum
    avail = Counter(r["lang"] for r in docs.select("lang").collect())
    for lang in targets:
        assert counts[lang] <= avail[lang]


def test_mixture_resample_deterministic_and_subset(spark, sf_dir):
    from wikidata_qrank_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    targets = {"en": 500000, "de": 500000}
    a = sorted(r["doc_id"] for r in mixture_resample(docs, "lang", "doc_id", targets).collect())
    b = sorted(
        r["doc_id"]
        for r in mixture_resample(docs.repartition(9), "lang", "doc_id", targets).collect()
    )
    assert a == b and len(a) > 0
    # unlisted strata dropped entirely
    langs = {
        r["lang"]
        for r in mixture_resample(docs, "lang", "doc_id", targets).select("lang").distinct().collect()
    }
    assert langs <= {"en", "de"}


def test_mixture_resample_rejects_bad_targets(spark):
    d = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        mixture_resample(d, "lang", "doc_id", {})
    with pytest.raises(ValueError):
        mixture_resample(d, "lang", "doc_id", {"en": 0})


def test_mixture_resample_rejects_absent_stratum(spark):
    """Round-6 ADVICE fix: a stratum named in targets_ppm but absent
    from the input makes the requested mixture unsatisfiable (its
    achievable size is 0) — refuse instead of silently dropping it
    from the bottleneck min."""
    import pytest

    from wikidata_qrank_spark.operators.sampling import mixture_resample

    d = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de")], "doc_id long, lang string"
    )
    with pytest.raises(ValueError, match="absent"):
        mixture_resample(
            d, "lang", "doc_id", {"en": 500_000, "zh": 500_000}
        ).collect()
