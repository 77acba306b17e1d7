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
