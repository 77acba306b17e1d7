"""Graph analytics (degrees, PageRank) over triple edges."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_two_hop_approx_accuracy_vs_exact(spark):
    """On a random-ish graph at bucket_bits=12 the HLL estimate of
    |two-hop set ∪ {possible self}| is within the sketch's error band
    of the exact count for every source."""
    from wikidata_qrank_spark.operators.graph import two_hop_approx, two_hop_counts

    edges = spark.createDataFrame(
        [(a, (a * 7 + k * 13) % 60) for a in range(60) for k in range(5)
         if a != (a * 7 + k * 13) % 60],
        "src_id long, dst_id long",
    )
    exact = {r.src_id: r.n_two_hop for r in two_hop_counts(edges).collect()}
    # exact-with-self counterpart of the sketch's semantics
    e1 = edges.selectExpr("src_id a", "dst_id m")
    e2 = edges.selectExpr("src_id m", "dst_id c")
    withself = {
        r.a: r.n
        for r in e1.join(e2, "m").groupBy("a").agg(
            F.countDistinct("c").alias("n")).collect()
    }
    got = {r.src_id: r.n_two_hop_est for r in two_hop_approx(edges).collect()}
    assert set(got) == set(exact)
    for s, est in got.items():
        truth = withself[s]
        assert abs(est - truth) <= max(3.0, 0.1 * truth), (s, est, truth)


def test_two_hop_approx_register_cap_on_hub(spark):
    """Zipf/hub shape: a 400-out-degree hub. The exact self-join
    materializes in-deg × out-deg = 400 × 400 = 160k rows through the
    hub; the sketch path's per-mid register table is capped at
    m = 2^bucket_bits rows per mid REGARDLESS of degree, so the edge
    join fans out to at most |E| × m."""
    from wikidata_qrank_spark.operators.graph import two_hop_approx
    from wikidata_qrank_spark.operators.sketches import hll_registers

    hub = 100000
    fan = 400
    rows = [(i, hub) for i in range(1, fan + 1)]
    rows += [(hub, 1000 + j) for j in range(fan)]
    edges = spark.createDataFrame(rows, "src_id long, dst_id long")

    bits = 6  # m = 64 registers
    e2 = edges.selectExpr("src_id m", "CAST(dst_id AS STRING) __c")
    regs = hll_registers(e2, "__c", ["m"], bits)
    per_mid = {r.m: r.n for r in regs.groupBy("m").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert per_mid[hub] <= 64  # 400 neighbors -> <= 64 register rows
    # join fan-out through the hub: fan × m vs fan × fan for the exact
    join_rows = edges.selectExpr("src_id a", "dst_id m").join(regs, "m").count()
    assert join_rows <= len(rows) * 64
    assert join_rows < fan * fan  # strictly below the hub-squared term

    est = {r.src_id: r.n_two_hop_est for r in
           two_hop_approx(edges, bucket_bits=12).collect()}
    # each spoke reaches the hub's 400 out-neighbors
    for i in (1, 2, 3):
        assert abs(est[i] - fan) <= 0.1 * fan


def test_pmi_does_not_broadcast_item_dim(spark):
    """The per-item doc-frequency dim scales with the KB, so
    cooccurrence_pmi must not hard-hint it broadcast: with the
    auto-broadcast threshold off, the only broadcast left in the plan
    is the hinted 1-row corpus-size aggregate (nested-loop join)."""
    from wikidata_qrank_spark.operators.graph import cooccurrence_pmi

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        m = spark.createDataFrame(
            [("d%d" % i, i % 7) for i in range(50)],
            "doc_id string, item_id long",
        )
        plan = (
            cooccurrence_pmi(m)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_k_core_triangle_with_pendants(spark):
    """Triangle {1,2,3} plus pendant chain 3-4, 4-5: the 2-core is
    exactly the triangle (each member keeps degree 2); pendants peel
    off over two rounds."""
    from wikidata_qrank_spark.operators.graph import k_core

    edges = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)])
    got = {r.node: r.core_degree for r in k_core(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_empty_when_no_core(spark):
    from wikidata_qrank_spark.operators.graph import k_core

    edges = _edges(spark, [(1, 2), (2, 3), (3, 4)])  # a path: no 2-core
    assert k_core(edges, k=2).count() == 0


def test_k_core_ignores_direction_and_duplicates(spark):
    """Reverse/parallel edges and self-loops collapse before peeling:
    1↔2 twice plus a self-loop is still just one undirected edge, so
    there is no 2-core."""
    from wikidata_qrank_spark.operators.graph import k_core

    edges = _edges(spark, [(1, 2), (2, 1), (1, 2), (1, 1)])
    assert k_core(edges, k=2).count() == 0


def test_hits_star_graph(spark):
    """Star u→{2,3,4} from hubs {1,5}: sources are pure hubs
    (authority 0), sinks pure authorities (hub 0); L1 sums are 1 per
    side at every iteration."""
    from wikidata_qrank_spark.operators.graph import hits

    edges = _edges(spark, [(1, 2), (1, 3), (1, 4), (5, 2), (5, 3)])
    rows = {r.node: r for r in hits(edges, iters=3).collect()}
    assert rows[1].authority == 0.0 and rows[5].authority == 0.0
    for sink in (2, 3, 4):
        assert rows[sink].hub == 0.0
    assert abs(sum(r.hub for r in rows.values()) - 1.0) < 1e-5
    assert abs(sum(r.authority for r in rows.values()) - 1.0) < 1e-5
    # node 2 and 3 receive from both hubs, node 4 from one
    assert rows[2].authority == rows[3].authority > rows[4].authority
    # hub 1 links to all three sinks, hub 5 to the two strong ones:
    # both positive, and 1's extra (weaker) sink still wins
    assert rows[1].hub > rows[5].hub > 0.0
