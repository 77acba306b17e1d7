"""Connected-components / dup-cluster materialization."""

from __future__ import annotations

from wikidata_qrank_spark.operators.clusters import (
    connected_components,
    dedup_by_clusters,
    dup_clusters,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_components_simple_chain(spark):
    """1-2, 2-3, 9-10: a 3-chain (needs >1 propagation round) + a pair."""
    cc = {
        r.doc_id: r.component
        for r in connected_components(_pairs(spark, [(1, 2), (2, 3), (9, 10)])).collect()
    }
    assert cc == {1: 1, 2: 1, 3: 1, 9: 9, 10: 9}


def test_components_long_chain_converges(spark):
    """A 9-node path graph — diameter forces several min-label rounds."""
    edges = [(i, i + 1) for i in range(1, 9)]
    cc = {r.doc_id: r.component for r in connected_components(_pairs(spark, edges)).collect()}
    assert cc == {i: 1 for i in range(1, 10)}


def test_dup_clusters_survivor_election(spark):
    rows = {
        (r.doc_id, r.component, r.is_survivor)
        for r in dup_clusters(_pairs(spark, [(5, 7), (7, 6)])).collect()
    }
    assert rows == {(5, 5, True), (6, 5, False), (7, 5, False)}


def test_dedup_by_clusters_keeps_survivors_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    kept = sorted(
        r.doc_id
        for r in dedup_by_clusters(docs, _pairs(spark, [(1, 2), (2, 3), (5, 6)])).collect()
    )
    # 2,3 fold into 1; 6 folds into 5; 4 and 7 untouched singletons
    assert kept == [1, 4, 5, 7]


def test_components_raise_when_not_converged(spark):
    import pytest

    from wikidata_qrank_spark.operators.clusters import ComponentsNotConverged

    edges = [(i, i + 1) for i in range(1, 9)]  # diameter 8 path
    with pytest.raises(ComponentsNotConverged):
        connected_components(_pairs(spark, edges), max_iters=2).collect()


def test_dup_clusters_scaled_matches_exact_kernel(spark):
    """The composed scale pipeline (LSH candidates → exact-Jaccard
    verify on candidates only → CC) must find the same clusters as the
    exact shingle self-join on a corpus of true near-dups: high-Jaccard
    pairs are LSH candidates with probability ≈1 at 8×4 banding, and
    the verification stage is the same Jaccard, so outputs coincide."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.clusters import (
        connected_components,
        dup_clusters_scaled,
    )
    from wikidata_qrank_spark.operators.dedup import (
        inject_near_dups,
        jaccard_verify_candidates,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (1, base + " alpha beta gamma"),
        (2, base + " alpha beta delta"),   # near-dup of 1
        (3, base + " alpha beta gamma x"), # near-dup of 1 and 2
        (10, " ".join(f"other{i}" for i in range(40))),
        (11, " ".join(f"other{i}" for i in range(39)) + " tail"),  # near-dup of 10
        (20, " ".join(f"lone{i}" for i in range(40))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact_cc = {
        (r.doc_id, r.component)
        for r in connected_components(
            ngram_jaccard_pairs(docs, n=3, threshold=0.5)
        ).collect()
    }
    scaled_cc = {
        (r.doc_id, r.component)
        for r in dup_clusters_scaled(docs, threshold=0.5).collect()
    }
    assert scaled_cc == exact_cc
    assert {1, 2, 3, 10, 11} == {d for d, _ in scaled_cc}

    # verified candidates are a SUBSET of the exact pair set (the LSH
    # stage can only lose candidates, never invent high-Jaccard pairs)
    cand = minhash_lsh_pairs(docs)
    verified = {
        (r.doc_a, r.doc_b)
        for r in jaccard_verify_candidates(docs, cand, threshold=0.5).collect()
    }
    exact_pairs = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert verified <= exact_pairs

    # injection derives a near-dup for every doc_id % every == 0
    injected = inject_near_dups(docs, every=10)
    assert injected.count() == len(rows) + 2  # ids 10 and 20 gain copies
    # and the injected copy is a true near-dup: clustering the injected
    # corpus groups each original with its +10M copy
    inj_cc = {
        (r.doc_id, r.component)
        for r in dup_clusters_scaled(injected, threshold=0.5).collect()
    }
    assert (10_000_020, 20) in inj_cc


def test_elect_survivors_prefers_score_then_id(spark):
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.clusters import elect_survivors

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)],
        "doc_id long, component long",
    )
    scores = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (7, 2), (8, 2)], "doc_id long, s long"
    )
    rows = {r.component: (r.best_doc_id, r.best_s, r.cluster_size)
            for r in elect_survivors(comp, scores, "s").collect()}
    assert rows[1] == (2, 9, 3)   # max score, tie -> lower id
    assert rows[7] == (7, 2, 2)


def test_best_of_cluster_originals_beat_injected_copies(spark):
    """Injection drops trailing tokens, so the original is the longest
    member of every injected cluster — the election must never pick a
    clipped copy (doc_id >= the injection offset)."""
    import __spark_entry__ as e
    from tests.conftest import SF_SMOKE

    rows = e.queries()["td_best_of_cluster"](spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(r.best_doc_id < 10_000_000 for r in rows)
