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


def test_label_propagation_two_cliques(spark):
    """Two triangles joined by one bridge edge: LPA settles each
    triangle on its minimum member id; the bridge does not merge
    them (a single cross-neighbor never outvotes two in-clique
    neighbors under the min-label tiebreak)."""
    from wikidata_qrank_spark.operators.graph import label_propagation

    e = _edges(
        spark,
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
    )
    got = {r.node: r.community for r in label_propagation(e, rounds=3).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12]
    assert got[10] != got[1]


def test_label_propagation_fixpoint_stable(spark):
    """Extra rounds past the fixpoint change nothing (the contract
    that lets the engine's early exit match a fixed-round oracle)."""
    from wikidata_qrank_spark.operators.graph import label_propagation

    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    a = sorted(tuple(r) for r in label_propagation(e, rounds=2).collect())
    b = sorted(tuple(r) for r in label_propagation(e, rounds=6).collect())
    assert a == b


def test_harmonic_centrality_path(spark):
    """Path 1-2-3-4-5 with landmarks = all nodes: harmonic_num is the
    exact hand-computed sum of 12/dist over the other nodes."""
    from wikidata_qrank_spark.operators.graph import harmonic_centrality

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {
        r.node: (r.harmonic_num, r.harmonic)
        for r in harmonic_centrality(e, n_landmarks=5, max_hops=4).collect()
    }
    # node 3 (center): dists 1,1,2,2 -> 12+12+6+6 = 36
    assert got[3][0] == 36
    # node 1 (end): dists 1,2,3,4 -> 12+6+4+3 = 25
    assert got[1][0] == 25
    assert got[1][1] == 25 / 12.0
    # symmetry
    assert got[1] == got[5] and got[2] == got[4]


def test_harmonic_centrality_hop_cap_and_landmarks(spark):
    """With max_hops=1 only direct landmark neighbors score; with a
    1-landmark budget only the smallest id seeds distances."""
    from wikidata_qrank_spark.operators.graph import harmonic_centrality

    e = _edges(spark, [(1, 2), (2, 3)])
    got = {
        r.node: r.harmonic_num
        for r in harmonic_centrality(e, n_landmarks=1, max_hops=1).collect()
    }
    # landmark 1: node 2 at dist 1 -> lcm(1..1)=1 -> 1; nodes 1,3 -> 0
    assert got == {1: 0, 2: 1, 3: 0}


def test_personalized_pagerank_two_cycle_hand_computed(spark):
    """1<->2 with seed {1}, one iteration: rank(1) = (1-d)/1 = 0.15,
    rank(2) = d * rank0(1)/outdeg = 0.85 — the restart mass goes to
    the seed, the walk mass to its neighbor."""
    from wikidata_qrank_spark.operators.graph import personalized_pagerank

    e = _edges(spark, [(1, 2), (2, 1)])
    got = {
        r.node: r.rank
        for r in personalized_pagerank(e, n_seeds=1, iters=1).collect()
    }
    assert got == {1: 0.15, 2: 0.85}


def test_personalized_pagerank_decays_from_seed(spark):
    """3-cycle 1->2->3->1 with seed {1}, run to (near) convergence:
    relatedness decays with walk distance from the seed. Converged
    solution of r1 = 0.15 + .85*r3, r2 = .85*r1, r3 = .85*r2 is
    r1 ≈ 0.3887 > r2 ≈ 0.3304 > r3 ≈ 0.2808; the initial unit pulse
    decays by only ~0.85³ per 3-round lap, so after 12 rounds the
    ordering is settled but values are still ~0.09 off the fixpoint —
    assert ordering plus a coarse band, not the exact limit."""
    from wikidata_qrank_spark.operators.graph import personalized_pagerank

    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    got = {
        r.node: r.rank
        for r in personalized_pagerank(e, n_seeds=1, iters=12).collect()
    }
    assert got[1] > got[2] > got[3] > 0.0
    assert abs(got[1] - 0.15 / (1.0 - 0.85**3)) < 0.15


def test_personalized_pagerank_differs_from_uniform(spark):
    """On an asymmetric graph PPR(seed=min id) and uniform PageRank
    disagree — the seed side is boosted."""
    from wikidata_qrank_spark.operators.graph import pagerank
    from wikidata_qrank_spark.operators.graph import personalized_pagerank

    edges = [(1, 2), (2, 1), (3, 4), (4, 3), (2, 3)]
    e = _edges(spark, edges)
    ppr = {r.node: r.rank for r in personalized_pagerank(e, n_seeds=1, iters=3).collect()}
    pr = {r.node: r.rank for r in pagerank(e, iters=3).collect()}
    assert set(ppr) == set(pr) == {1, 2, 3, 4}
    assert ppr[1] + ppr[2] > ppr[3] + ppr[4]
    assert ppr != pr


def test_clustering_coefficient_golden(spark):
    """Two triangles sharing node 3 plus a pendant: node 3 has deg 4
    and 2 triangles -> cc = 2*2/(4*3) = 1/3; triangle-only nodes have
    cc 1; the pendant chain node keeps cc 0 via the left join."""
    from wikidata_qrank_spark.operators.graph import clustering_coefficient

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (5, 6)],
        "src_id long, dst_id long",
    )
    got = {r.node: (r.deg, r.n_triangles, r.cc_ppm) for r in
           clustering_coefficient(edges).collect()}
    assert got == {
        1: (2, 1, 1000000),
        2: (2, 1, 1000000),
        3: (4, 2, 333333),
        4: (2, 1, 1000000),
        5: (3, 1, 333333),
        6: (1, 0, 0),
    }
