"""SPARQL-style BGP matching and N-Triples export (operators/bgp.py)."""

import pytest


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_bgp_two_hop_with_constant(spark):
    """[?x knows ?y, ?y knows Qc]: constant object filters, shared
    variable joins; the likes-edge never matches the knows pattern."""
    from wikidata_qrank_spark.operators.bgp import bgp_match

    t = _triples(spark, [
        ("Qa", "knows", "Qb"), ("Qb", "knows", "Qc"),
        ("Qd", "knows", "Qc"), ("Qa", "likes", "Qc"),
    ])
    got = {tuple(r) for r in bgp_match(
        t, [("?x", "knows", "?y"), ("?y", "knows", "Qc")]).collect()}
    assert got == {("Qa", "Qb")}
    cols = bgp_match(t, [("?x", "knows", "?y"), ("?y", "knows", "Qc")]).columns
    assert cols == ["x", "y"]


def test_bgp_cycle_pattern_and_repeated_var(spark):
    """3-cycle conjunction finds each rotation of the cycle; a
    repeated variable inside one pattern keeps self-loops only."""
    from wikidata_qrank_spark.operators.bgp import bgp_match

    t = _triples(spark, [
        ("Q1", "links_to", "Q2"), ("Q2", "links_to", "Q3"),
        ("Q3", "links_to", "Q1"), ("Q1", "links_to", "Q9"),
        ("Q7", "links_to", "Q7"),
    ])
    cyc = {tuple(r) for r in bgp_match(t, [
        ("?a", "links_to", "?b"), ("?b", "links_to", "?c"),
        ("?c", "links_to", "?a")]).collect()}
    # SPARQL has no implicit disjointness: the self-loop binds all
    # three variables to Q7 and satisfies the conjunction
    assert cyc == {("Q1", "Q2", "Q3"), ("Q2", "Q3", "Q1"),
                   ("Q3", "Q1", "Q2"), ("Q7", "Q7", "Q7")}
    loops = {tuple(r) for r in bgp_match(
        t, [("?x", "links_to", "?x")]).collect()}
    assert loops == {("Q7",)}


def test_bgp_rejects_cartesian_and_empty(spark):
    from wikidata_qrank_spark.operators.bgp import bgp_match

    t = _triples(spark, [("Qa", "p", "Qb")])
    with pytest.raises(ValueError, match="cartesian"):
        bgp_match(t, [("?x", "p", "?y"), ("?z", "p", "?w")])
    with pytest.raises(ValueError):
        bgp_match(t, [])


def test_ntriples_lines(spark):
    from wikidata_qrank_spark.operators.bgp import to_ntriples

    t = _triples(spark, [("Q1", "links_to", "Q2")])
    assert to_ntriples(t).collect()[0].line == (
        "<http://example.org/Q1> <http://example.org/links_to> "
        "<http://example.org/Q2> ."
    )


def test_bgp_optional_left_join_semantics(spark):
    """OPTIONAL keeps every required binding and leaves the optional
    variable NULL where the pattern has no match — and never
    multiplies required rows that do match once."""
    from wikidata_qrank_spark.operators.bgp import bgp_match

    t = _triples(spark, [
        ("Qa", "knows", "Qb"), ("Qb", "knows", "Qc"),
        ("Qd", "knows", "Qe"),
    ])
    got = {(r.x, r.y, r.z) for r in bgp_match(
        t, [("?x", "knows", "?y")],
        optional=[("?y", "knows", "?z")]).collect()}
    assert got == {("Qa", "Qb", "Qc"), ("Qb", "Qc", None),
                   ("Qd", "Qe", None)}


def test_bgp_optional_requires_shared_var(spark):
    import pytest as _pytest

    from wikidata_qrank_spark.operators.bgp import bgp_match

    t = _triples(spark, [("Qa", "p", "Qb")])
    with _pytest.raises(ValueError, match="optional"):
        bgp_match(t, [("?x", "p", "?y")], optional=[("?z", "p", "?w")])
