"""Graph analytics (degrees, PageRank) over triple edges."""

from __future__ import annotations

from wikidata_qrank_spark.operators.graph import degrees, pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src_id long, dst_id long")


def test_degrees(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3)])
    got = {r.node: (r.out_degree, r.in_degree) for r in degrees(e).collect()}
    assert got == {1: (2, 0), 2: (1, 1), 3: (0, 2)}


def test_pagerank_star_graph(spark):
    """Everything points at the hub → hub rank strictly dominates, and
    leaf ranks are equal (symmetry)."""
    e = _edges(spark, [(1, 9), (2, 9), (3, 9), (4, 9)])
    got = {r.node: r.rank for r in pagerank(e, iters=3).collect()}
    assert got[9] > max(got[i] for i in (1, 2, 3, 4))
    assert len({got[i] for i in (1, 2, 3, 4)}) == 1
    # all ranks positive, total mass bounded by 1 (dangling mass drops)
    assert all(v > 0 for v in got.values())
    assert sum(got.values()) <= 1.0 + 1e-6


def test_pagerank_deterministic_across_runs(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 3)])
    a = sorted(tuple(r) for r in pagerank(e, iters=3).collect())
    b = sorted(tuple(r) for r in pagerank(e, iters=3).collect())
    assert a == b


def test_pagerank_empty(spark):
    e = _edges(spark, [])
    assert pagerank(e).count() == 0


def test_triangles_counts_with_dups_and_loops(spark):
    """Two triangles sharing node 3; reverse/parallel edges and a
    self-loop must collapse before counting."""
    from wikidata_qrank_spark.operators.graph import triangles

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 1), (4, 4), (3, 4), (4, 5), (5, 3), (3, 4)],
        "src_id long, dst_id long",
    )
    got = {r.node: r.n_triangles for r in triangles(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_triangles_none(spark):
    from wikidata_qrank_spark.operators.graph import triangles

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src_id long, dst_id long")
    assert triangles(edges).count() == 0


def test_bfs_distances_hand_graph(spark):
    """Path 1-2-3-4 with a shortcut 1-4 and an unreachable node 9:
    shortest hops win, unreachable nodes absent, max_hops bounds."""
    from wikidata_qrank_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (4, 5), (9, 10)],
        "src_id long, dst_id long",
    )
    got = {r.node: r.hops for r in bfs_distances(edges, source=1).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    capped = {r.node: r.hops for r in bfs_distances(edges, source=1, max_hops=1).collect()}
    assert capped == {1: 0, 2: 1, 4: 1}


def test_reciprocity_hand_graph(spark):
    from wikidata_qrank_spark.operators.graph import reciprocity

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 3)],  # self-loop dropped
        "src_id long, dst_id long",
    )
    rows = {r.node: (r.n_out, r.n_reciprocal, r.reciprocity)
            for r in reciprocity(edges).collect()}
    assert rows[1] == (2, 1, 0.5)
    assert rows[2] == (1, 1, 1.0)
    assert 3 not in rows  # no out-edges after self-loop drop
