from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_qrank_spark.operators.dedup import (
    dedup_exact,
    exact_duplicate_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog again and again tonight"),  # near dup
    (4, "completely different content about spark shuffles and partitions here"),
    (5, "COMPLETELY  different content about spark shuffles and partitions here"),  # ws/case dup of 4
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicate_groups(spark):
    groups = exact_duplicate_groups(_docs(spark)).collect()
    got = sorted(tuple(r.doc_ids) for r in groups)
    assert got == [[1, 2], [4, 5]] or got == [(1, 2), (4, 5)]


def test_dedup_exact_keeps_lowest_id(spark):
    kept = sorted(r.doc_id for r in dedup_exact(_docs(spark)).collect())
    assert kept == [1, 3, 4]


def test_ngram_jaccard_near_dup(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    # 4/5 share the tail trigrams but differ at the head (case + double
    # space change the leading grams): similar but not identical
    assert (4, 5) in pairs and pairs[(4, 5)] < 1.0
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(_docs(spark)).collect()
    }
    assert (1, 2) in pairs  # identical → all bands equal
    assert (1, 3) in pairs  # 1-token diff → some band collides
    assert (1, 4) not in pairs


def test_simhash_near_pairs(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_pairs(_docs(spark), max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 10
    assert (1, 4) not in pairs


def test_minhash_is_deterministic(spark):
    a = {tuple(r) for r in minhash_lsh_pairs(_docs(spark)).collect()}
    b = {tuple(r) for r in minhash_lsh_pairs(_docs(spark)).collect()}
    assert a == b
