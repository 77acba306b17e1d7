"""Fact fusion (operators/fusion.py) and deterministic negative
sampling (operators/negatives.py) — hand-computed goldens on tiny
frames plus invariants on the sf0.001 fixture.

Reference parity note: the reference pipeline has no fusion or
negative-sampling stage (its dictionary join trusts the sitelinks
table — cmd/qrank-builder/build.go); these are training-data-pipeline
extensions over the same mention relation.
"""

from __future__ import annotations

import pytest

from wikidata_qrank_spark.operators.fusion import claims, fact_fusion
from wikidata_qrank_spark.operators.negatives import negative_samples


def _mentions(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, offset int, item_id long")


def test_claims_per_document_instances(spark):
    m = _mentions(
        spark,
        [
            ("d1", 0, 1),
            ("d1", 1, 2),
            ("d1", 2, 2),  # repeated mention → no self edge
            ("d1", 3, 1),
            ("d2", 0, 5),
        ],
    )
    got = {tuple(r) for r in claims(m).collect()}
    # d1 asserts 1→2 (offset 0→1) and 2→1 (offset 2→3); the 1→1 at
    # offsets... none; d2 has a single mention → no claim.
    assert got == {("d1", 1, 2), ("d1", 2, 1)}


def test_fact_fusion_reliability_beats_spam():
    """A spam source repeating one wrong fact many times loses to two
    independent agreeing sources — the property a claim-count vote
    lacks (claim-count would give spam 3 votes vs 2)."""
    spark = pytest.importorskip("pyspark.sql").SparkSession.getActiveSession()
    cl = spark.createDataFrame(
        [
            # subject 10: honest sources a, b say obj=1; spammer s says obj=2 thrice
            ("a", 10, 1),
            ("b", 10, 1),
            ("s", 10, 2),
            ("s", 10, 2),
            ("s", 10, 2),
            # subject 20: everyone agrees (keeps a/b reliability at 10⁶)
            ("a", 20, 7),
            ("b", 20, 7),
        ],
        "source_id string, subj_id long, obj_id long",
    )
    out = {r["subj_id"]: r.asDict() for r in fact_fusion(cl).collect()}
    # bootstrap: subj 10 winner by distinct sources = obj 1 (2 sources vs 1)
    # reliability: a=b=10⁶ (2/2 agree), s=0 (0/3)
    # re-vote subj 10: obj1 weight 2·10⁶, obj2 weight 0 → obj 1 wins
    assert out[10]["obj_id"] == 1
    assert out[10]["weight_ppm"] == 2_000_000
    assert out[10]["n_sources"] == 2
    assert out[20]["obj_id"] == 7
    assert out[20]["weight_ppm"] == 2_000_000


def test_fact_fusion_tie_breaks_to_smallest_object(spark):
    cl = spark.createDataFrame(
        [("a", 1, 9), ("b", 1, 3)],
        "source_id string, subj_id long, obj_id long",
    )
    out = fact_fusion(cl).collect()
    assert len(out) == 1
    # bootstrap tie (1 source each) → obj 3; a disagrees with it → r=0,
    # b agrees → r=10⁶ → re-vote keeps 3.
    assert out[0]["obj_id"] == 3


def test_fact_fusion_one_row_per_subject(spark, sf_dir):
    from wikidata_qrank_spark.plans.pipeline import build_graph

    tm = build_graph(spark, sf_dir)["text_mentions"]
    fused = fact_fusion(claims(tm))
    rows = fused.collect()
    subjects = [r["subj_id"] for r in rows]
    assert len(subjects) == len(set(subjects))
    assert all(r["weight_ppm"] >= 0 and r["n_sources"] >= 1 for r in rows)


def test_negative_samples_deterministic_and_filtered(spark):
    e = spark.createDataFrame(
        [("d1", 1), ("d1", 2), ("d2", 2), ("d2", 3), ("d3", 4)],
        "doc_id string, item_id long",
    )
    kw = dict(k=3, src="doc_id", dst="item_id", pool="dst")
    a = sorted(map(tuple, negative_samples(e, **kw).collect()))
    b = sorted(map(tuple, negative_samples(e.repartition(7), **kw).collect()))
    assert a == b  # partitioning-proof
    pos = {("d1", 1), ("d1", 2), ("d2", 2), ("d2", 3), ("d3", 4)}
    for src, dst, neg, i in a:
        assert (src, neg) not in pos  # filtered setting
        assert neg in {1, 2, 3, 4}  # dst pool only
        assert 0 <= i < 3
    # ≤ k per positive edge
    from collections import Counter

    c = Counter((src, dst) for src, dst, _, _ in a)
    assert all(v <= 3 for v in c.values())


def test_negative_samples_both_pool_excludes_self(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src_id long, dst_id long"
    )
    out = negative_samples(e, k=4, pool="both").collect()
    for r in out:
        assert r["neg_id"] != r["src_id"]
        assert (r["src_id"], r["neg_id"]) not in {(1, 2), (2, 3), (3, 1), (4, 1)}
        assert r["neg_id"] in {1, 2, 3, 4}


def test_negative_samples_rejects_bad_args(spark):
    e = spark.createDataFrame([(1, 2)], "src_id long, dst_id long")
    with pytest.raises(ValueError):
        negative_samples(e, k=0)
    with pytest.raises(ValueError):
        negative_samples(e, pool="src")
