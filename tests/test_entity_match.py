"""Blocked entity resolution (operators/linking.py entity_match)."""

import math

import pytest
from pyspark.sql import functions as F  # noqa: F401


def test_entity_match_blocking_and_scores(spark):
    """'john smith'/'jon smith' block together (j), score above the
    default threshold, and carry same_entity=True when redirects
    canonicalized them to one item; 'zeus' never pairs outside its
    block; a same-block far pair ('jack'/'joinery') dies on the
    length band or the score."""
    from wikidata_qrank_spark.operators.linking import entity_match

    d = spark.createDataFrame(
        [
            ("john smith", 7), ("jon smith", 7),   # same entity, lev 1
            ("jack", 9), ("joinery", 11), ("zeus", 3),
        ],
        "title string, item_id long",
    )
    got = {(r.title_a, r.title_b): r for r in entity_match(d).collect()}
    assert ("john smith", "jon smith") in got
    r = got[("john smith", "jon smith")]
    assert r.lev == 1 and r.same_entity is True
    assert r.sim_micro == math.floor((1 - 1 / 10) * 1e6 + 0.5)
    assert all("zeus" not in pair for pair in got)
    assert ("jack", "joinery") not in got


def test_entity_match_threshold_and_block_chars(spark):
    """Raising block_chars splits 'jack'/'jill' into different blocks
    (ja vs ji); loosening min_sim_micro to 0 surfaces every blocked
    candidate pair."""
    from wikidata_qrank_spark.operators.linking import entity_match

    d = spark.createDataFrame(
        [("jack", 1), ("jill", 2), ("joke", 3)],
        "title string, item_id long",
    )
    all_pairs = {
        (r.title_a, r.title_b)
        for r in entity_match(d, min_sim_micro=0).collect()
    }
    assert all_pairs == {("jack", "jill"), ("jack", "joke"), ("jill", "joke")}
    two_char = {
        (r.title_a, r.title_b)
        for r in entity_match(d, block_chars=2, min_sim_micro=0).collect()
    }
    assert two_char == set()


def test_entity_match_rejects_bad_block_chars(spark):
    from wikidata_qrank_spark.operators.linking import entity_match

    d = spark.createDataFrame([("a", 1)], "title string, item_id long")
    with pytest.raises(ValueError):
        entity_match(d, block_chars=0)


def test_er_blocking_metrics_golden(spark):
    """5 titles = 10 all-pairs; blocks {j: jack/jill/joke} and
    {z: zeus/zen} give 3 + 1 block pairs before the length band;
    'zen'(3) vs 'zeus'(4) stays inside the +-3 band -> 4 candidates,
    reduction = 1000*(10-4)//10 = 600."""
    from wikidata_qrank_spark.operators.linking import er_blocking_metrics

    d = spark.createDataFrame(
        [("jack", 1), ("jill", 2), ("joke", 3), ("zeus", 4), ("zen", 5)],
        "title string, item_id long",
    )
    row = er_blocking_metrics(d).collect()[0]
    assert (row.n_titles, row.n_candidate_pairs, row.n_all_pairs,
            row.reduction_permille) == (5, 4, 10, 600)


def test_er_blocking_metrics_degenerate_single_title(spark):
    """n < 2 titles -> zero possible pairs; reduction is NULL, not a
    division-by-zero."""
    from wikidata_qrank_spark.operators.linking import er_blocking_metrics

    d = spark.createDataFrame([("solo", 1)], "title string, item_id long")
    row = er_blocking_metrics(d).collect()[0]
    assert (row.n_titles, row.n_candidate_pairs, row.n_all_pairs) == (1, 0, 0)
    assert row.reduction_permille is None
