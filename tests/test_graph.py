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


def test_neighborhood_function_accuracy_vs_exact_bfs(spark):
    """HyperANF ball estimates track the exact BFS out-ball sizes
    (including the start node) within the m=4096 error band at every
    hop, and the per-(node,hops) estimates are monotone in hops —
    merging registers can only grow the sketched set."""
    from wikidata_qrank_spark.operators.graph import neighborhood_function

    pairs = [(a, (a * 7 + k * 13) % 40) for a in range(40) for k in range(3)
             if a != (a * 7 + k * 13) % 40]
    edges = spark.createDataFrame(pairs, "src_id long, dst_id long")
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    nodes = set(adj) | {b for _, b in pairs}

    def ball(v, h):
        seen, frontier = {v}, {v}
        for _ in range(h):
            frontier = {c for u in frontier for c in adj.get(u, ())} - seen
            seen |= frontier
        return len(seen)

    got = {(r.node, r.hops): r.n_reachable_est
           for r in neighborhood_function(edges, max_hops=3).collect()}
    assert set(got) == {(v, h) for v in nodes for h in (1, 2, 3)}
    for (v, h), est in got.items():
        truth = ball(v, h)
        assert abs(est - truth) <= max(3.0, 0.1 * truth), (v, h, est, truth)
    for v in nodes:
        assert got[(v, 1)] <= got[(v, 2)] + 1e-9
        assert got[(v, 2)] <= got[(v, 3)] + 1e-9


def test_neighborhood_function_register_cap_on_hub(spark):
    """Power-law shape: a hub with 300 out-neighbors, each of which
    fans to 50 more. Exact 3-hop BFS sets through the hub are
    O(300*50) per spoke; HyperANF state stays <= 2^bits register rows
    per node regardless, so round h+1's shuffle is |E| x m bounded."""
    from wikidata_qrank_spark.operators.graph import neighborhood_function

    hub, rows = 0, []
    rows += [(hub, 1 + j) for j in range(300)]
    rows += [(1 + j, 1000 + (j * 50 + k) % 15000)
             for j in range(300) for k in range(50)]
    edges = spark.createDataFrame(rows, "src_id long, dst_id long")

    nf = neighborhood_function(edges, max_hops=2, bucket_bits=6)
    per = {(r.node, r.hops): (r.n_nonzero, r.n_reachable_est)
           for r in nf.collect()}
    # register rows never exceed m=64 even for the hub's 300-node ball
    assert all(nz <= 64 for nz, _ in per.values())
    # hub 2-hop ball is ~ 1 + 300 + distinct leaves (15000 cap ->
    # 300*50 = 15000 distinct): estimate within 15% at m=64
    est = per[(hub, 2)][1]
    truth = 1 + 300 + 15000
    assert abs(est - truth) <= 0.15 * truth, (est, truth)


def test_assortativity_golden(spark):
    """Hand-computed Pearson r over edge endpoint degrees (out-deg of
    src, in-deg of dst) on a graph with variance on BOTH margins."""
    from wikidata_qrank_spark.operators.graph import assortativity

    pairs = [(1, 2), (1, 3), (1, 4), (2, 4), (4, 5)]
    edges = spark.createDataFrame(pairs, "src_id long, dst_id long")
    dout, din = {}, {}
    for a, b in pairs:
        dout[a] = dout.get(a, 0) + 1
        din[b] = din.get(b, 0) + 1
    xs = [dout[a] for a, _ in pairs]
    ys = [din[b] for _, b in pairs]
    n = len(pairs)
    cov = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    vx = n * sum(x * x for x in xs) - sum(xs) ** 2
    vy = n * sum(y * y for y in ys) - sum(ys) ** 2
    import math

    expect = math.floor(cov / math.sqrt(vx * vy) * 1e6 + 0.5) / 1e6
    row = assortativity(edges).collect()[0]
    assert row.n_edges == 5
    assert row.assortativity == expect


def test_assortativity_zero_variance_is_null(spark):
    """A directed cycle has constant degrees on both margins ->
    zero variance -> NULL, not a 0/0 crash."""
    from wikidata_qrank_spark.operators.graph import assortativity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src_id long, dst_id long"
    )
    row = assortativity(edges).collect()[0]
    assert row.n_edges == 3 and row.assortativity is None


def test_effective_diameter_complete_vs_chain(spark):
    """On K5 every pair is 1 hop apart -> eff diameter < 1 (interp
    between hop 0 self-pairs and hop 1 saturation); on a directed
    6-chain reachability keeps growing to the hop cap -> diameter
    lands past 2. Distribution rows are monotone in hops and the
    hop-0 row is the exact node count in micro units."""
    from wikidata_qrank_spark.operators.graph import effective_diameter

    k5 = spark.createDataFrame(
        [(a, b) for a in range(5) for b in range(5) if a != b],
        "src_id long, dst_id long",
    )
    rows = {r.hops: r for r in effective_diameter(k5, max_hops=3).collect()}
    assert rows[0].n_pairs_micro == 5 * 1000000
    assert rows[1].n_pairs_micro <= rows[2].n_pairs_micro <= rows[3].n_pairs_micro
    eff = rows[1].eff_diameter
    assert all(r.eff_diameter == eff for r in rows.values())
    assert 0.0 < eff < 1.0

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src_id long, dst_id long"
    )
    ceff = effective_diameter(chain, max_hops=3).collect()[0].eff_diameter
    assert 2.0 < ceff <= 3.0


def test_link_prediction_square_golden(spark):
    """4-cycle 1-2-3-4: opposite corners share exactly the two other
    nodes; adjacent pairs share none (filtered at min_common=2).
    Jaccard = 2/(2+2-2) = 1, AA = 2·floor(1e6/ln 2 + .5) micro."""
    import math

    from wikidata_qrank_spark.operators.graph import link_prediction

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src_id long, dst_id long"
    )
    got = {(r.node_a, r.node_b): r for r in link_prediction(edges).collect()}
    assert set(got) == {(1, 3), (2, 4)}
    aa = 2 * math.floor(1e6 / math.log(2) + 0.5)
    for pair, r in got.items():
        assert (r.n_common, r.deg_a, r.deg_b) == (2, 2, 2)
        assert r.jaccard == 1.0
        assert r.aa_micro == aa
        assert r.is_edge is False


def test_link_prediction_mid_degree_cap(spark):
    """A hub joined to everything is excluded as a mid once its degree
    crosses max_mid_degree: pairs connected ONLY through the hub
    disappear, bounding wedge fan-out at |E|·D on Zipf graphs; a
    low-degree mid on the side still yields its pair, and is_edge
    flags pairs that are already adjacent."""
    from wikidata_qrank_spark.operators.graph import link_prediction

    hub = 99
    rows = [(hub, i) for i in range(10)]          # hub degree 10 + 2
    rows += [(50, 0), (50, 1), (51, 0), (51, 1)]  # mids 50,51 (deg 2)
    rows += [(0, 1)]                              # 0-1 adjacent
    edges = spark.createDataFrame(rows, "src_id long, dst_id long")
    capped = {(r.node_a, r.node_b): r
              for r in link_prediction(edges, max_mid_degree=4).collect()}
    # (0,1) survives via mids 50,51 (and NOT via the excluded hub):
    assert (0, 1) in capped
    assert capped[(0, 1)].n_common == 2
    assert capped[(0, 1)].is_edge is True
    # hub-only pairs (e.g. 2,3 — one shared mid) are gone under the
    # cap even at min_common=1...
    capped1 = {(r.node_a, r.node_b)
               for r in link_prediction(
                   edges, max_mid_degree=4, min_common=1).collect()}
    assert (2, 3) not in capped1
    # ...but present without it
    full = {(r.node_a, r.node_b)
            for r in link_prediction(
                edges, max_mid_degree=64, min_common=1).collect()}
    assert (2, 3) in full


def test_random_walks_valid_and_deterministic(spark):
    """Every step follows an undirected edge, row count is exactly
    |V|·walks·(len+1), and the corpus is identical across runs (no
    RNG state — picks are portable-hash functions of (start, walk,
    step)). One walk is replayed by hand with hashlib to pin the
    hash contract."""
    import hashlib

    from wikidata_qrank_spark.operators.graph import random_walks

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)]
    edges = spark.createDataFrame(pairs, "src_id long, dst_id long")
    und = set()
    for a, b in pairs:
        und.add((a, b))
        und.add((b, a))
    out1 = sorted(
        tuple(r) for r in random_walks(edges, 4, 2).collect()
    )
    out2 = sorted(
        tuple(r) for r in random_walks(edges, 4, 2).collect()
    )
    assert out1 == out2
    assert len(out1) == 4 * 2 * 5
    walks = {}
    for start, wno, step, node in out1:
        walks.setdefault((start, wno), {})[step] = node
    adj = {}
    for a, b in sorted(und):
        adj.setdefault(a, []).append(b)
    for (start, wno), seq in walks.items():
        assert seq[0] == start
        for t in range(1, 5):
            assert (seq[t - 1], seq[t]) in und
            # replay the pick: md5-based hash60 mod degree
            key = f"{start}|{wno}|{t}".encode()
            h = int(hashlib.md5(key).hexdigest()[:15], 16)
            assert seq[t] == adj[seq[t - 1]][h % len(adj[seq[t - 1]])]


def test_transe_step_exact_replay_and_loss_decrease(spark):
    """Replay the full step in Python (hashlib lattice init, integer
    diffs/grads, floor-division update) and require bit equality —
    plus the semantic check that one step at lr=1/100 lowers the
    squared translation loss on a small graph."""
    import hashlib

    from wikidata_qrank_spark.operators.graph import transe_step

    pairs = [(1, 2), (2, 3), (3, 1), (1, 3)]
    dim, denom = 8, 100
    edges = spark.createDataFrame(pairs, "src_id long, dst_id long")

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    nodes = {a for a, _ in pairs} | {b for _, b in pairs}
    emb0 = {(v, d): (h60(f"{v}|{d}") % 2001 - 1000) * 1000
            for v in nodes for d in range(dim)}
    rel = {d: (h60(f"r|{d}") % 2001 - 1000) * 1000 for d in range(dim)}
    grad = {k: 0 for k in emb0}
    for hh, tt in pairs:
        for d in range(dim):
            diff = emb0[(hh, d)] + rel[d] - emb0[(tt, d)]
            grad[(hh, d)] += 2 * diff
            grad[(tt, d)] -= 2 * diff
    emb1 = {k: emb0[k] - grad[k] // denom for k in emb0}  # python // floors

    got = {(r.node, r.dim): (r.emb0_micro, r.grad_micro, r.emb1_micro)
           for r in transe_step(edges, dim=dim, lr_denom=denom).collect()}
    assert set(got) == set(emb0)
    for k in emb0:
        assert got[k] == (emb0[k], grad[k], emb1[k]), k

    def loss(emb):
        return sum(
            (emb[(hh, d)] + rel[d] - emb[(tt, d)]) ** 2
            for hh, tt in pairs for d in range(dim)
        )

    assert loss(emb1) < loss(emb0)


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_skipgram_plan_has_no_cartesian(spark):
    """The 2w-offset design claim, asserted on the physical plan: the
    only nested-loop join is the broadcast of the ≤2w-row offset dim;
    the token-to-token match is a keyed equi-join (hash or sort-merge),
    never a CartesianProduct or a position-band nested loop."""
    from wikidata_qrank_spark.operators.textstats import skipgram_pairs

    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(20)], "doc_id long, text string"
    )
    plan = _plan_of(skipgram_pairs(docs))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the offsets dim


def test_random_walks_step_join_is_keyed(spark):
    """Each step probes the ranked adjacency on (node, idx) — a keyed
    equi-join; no cartesian anywhere, and the only nested-loop
    broadcast is the constant walk_no dim."""
    from wikidata_qrank_spark.operators.graph import random_walks

    edges = spark.createDataFrame(
        [(i, (i + 1) % 12) for i in range(12)], "src_id long, dst_id long"
    )
    plan = _plan_of(random_walks(edges, walk_len=2, walks_per_node=2))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_entity_match_block_join_is_equi(spark):
    """The ER block is an equi-key join on the blocking key (hash
    partitioned), not an all-pairs comparison: no cartesian / nested
    loop in the plan even with broadcast disabled."""
    from wikidata_qrank_spark.operators.linking import entity_match

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        d = spark.createDataFrame(
            [(f"title{i}", i) for i in range(50)], "title string, item_id long"
        )
        plan = _plan_of(entity_match(d))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_link_prediction_does_not_broadcast_degree_dim(spark):
    """The degree dim scales with the KB — link_prediction must leave
    its joins unhinted (AQE decides): with auto-broadcast off, no
    BroadcastHashJoin survives in the plan."""
    from wikidata_qrank_spark.operators.graph import link_prediction

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = spark.createDataFrame(
            [(i, (i * 3 + 1) % 30) for i in range(30)],
            "src_id long, dst_id long",
        )
        plan = _plan_of(link_prediction(edges))
        assert "BroadcastHashJoin" not in plan
        assert "CartesianProduct" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_edge_support_golden(spark):
    """Triangle {1,2,3} + pendant edge (3,4): triangle edges carry
    support 1, the pendant 0 (kept via the left join)."""
    from wikidata_qrank_spark.operators.graph import edge_support

    edges = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    got = {(r.node_a, r.node_b): r.support
           for r in edge_support(edges).collect()}
    assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 1, (3, 4): 0}


def test_k_truss_peels_and_cascades(spark):
    """Diamond (two triangles sharing edge 2-3): at k=3 the pendant
    peels but both triangles survive; at k=4 the 1-support edges peel
    in round one, which starves edge (2,3) and cascades to empty in
    round two — the multi-round behavior a single support filter
    misses."""
    from wikidata_qrank_spark.operators.graph import k_truss

    edges = _edges(
        spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]
    )
    t3 = {(r.node_a, r.node_b): r.support
          for r in k_truss(edges, k=3, rounds=3).collect()}
    assert set(t3) == {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)}
    assert t3[(2, 3)] == 2 and t3[(1, 2)] == 1
    assert k_truss(edges, k=4, rounds=3).count() == 0


def test_degree_histogram_golden(spark):
    """src degrees {1:2, 4:1} -> out histogram {2:1, 1:1}; dst degrees
    {2:1, 3:1, 5:1} -> in histogram {1:3}."""
    from wikidata_qrank_spark.operators.graph import degree_histogram

    edges = _edges(spark, [(1, 2), (1, 3), (4, 5)])
    got = {(r.side, r.degree): r.n_nodes
           for r in degree_histogram(edges).collect()}
    assert got == {("out", 2): 1, ("out", 1): 1, ("in", 1): 3}


def test_weighted_pagerank_weight_sensitivity(spark):
    """Two sources point at {2, 3} with weights 9:1 — node 2 outranks
    node 3; with equal weights they tie exactly (integer recurrence).
    Determinism: two runs produce identical micro ranks."""
    from wikidata_qrank_spark.operators.graph import weighted_pagerank

    skew = spark.createDataFrame(
        [(1, 2, 900), (1, 3, 100), (4, 2, 900), (4, 3, 100)],
        "src_id long, dst_id long, weight_micro long",
    )
    got = {r.node: r.rank_micro for r in weighted_pagerank(skew).collect()}
    assert got[2] > got[3] > 0
    assert got[1] == got[4]
    even = spark.createDataFrame(
        [(1, 2, 500), (1, 3, 500), (4, 2, 500), (4, 3, 500)],
        "src_id long, dst_id long, weight_micro long",
    )
    ev = {r.node: r.rank_micro for r in weighted_pagerank(even).collect()}
    assert ev[2] == ev[3]
    again = {r.node: r.rank_micro
             for r in weighted_pagerank(skew).collect()}
    assert again == got


def test_neighbor_sample_caps_and_determinism(spark):
    """A 50-out-degree hub contributes exactly fanout rows per hop
    (the sampler's point); the sample replays with hashlib and is
    identical across runs; hop-2 edges only extend hop-1 samples."""
    import hashlib

    from wikidata_qrank_spark.operators.graph import neighbor_sample

    hub = 0
    rows = [(hub, 100 + j) for j in range(50)]
    rows += [(100 + j, 200 + j) for j in range(50)]
    edges = _edges(spark, rows)
    out1 = sorted(tuple(r) for r in neighbor_sample(edges, (3, 2)).collect())
    out2 = sorted(tuple(r) for r in neighbor_sample(edges, (3, 2)).collect())
    assert out1 == out2
    hop1_hub = [r for r in out1 if r[1] == 1 and r[2] == hub]
    assert len(hop1_hub) == 3  # 50 neighbors -> 3 sampled

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    expect = sorted(
        range(100, 150),
        key=lambda v: (h60(f"{hub}|1|{hub}|{v}"), v),
    )[:3]
    assert sorted(r[3] for r in hop1_hub) == sorted(expect)
    # hop-2 srcs must be hop-1 dsts of the same seed
    hop1 = {(r[0], r[3]) for r in out1 if r[1] == 1}
    assert all((r[0], r[2]) in hop1 for r in out1 if r[1] == 2)


def test_link_prediction_metrics_hand_golden(spark):
    """Two seeds with known candidate rankings: seed 1's first true
    edge sits at rank 2 (rr 500000), seed 2's at rank 1 (rr 1e6);
    seed 3 has no true candidate and is excluded by the filtered
    protocol -> n_seeds 2, mean_rr 750000, hits1 500, hits3 1000."""
    from wikidata_qrank_spark.operators.graph import link_prediction_metrics

    scores = spark.createDataFrame(
        [
            (1, 10, 900, False), (1, 11, 800, True), (1, 12, 700, False),
            (2, 20, 500, True), (2, 21, 400, False),
            (3, 30, 300, False),
        ],
        "node_a long, node_b long, aa_micro long, is_edge boolean",
    )
    row = link_prediction_metrics(scores).collect()[0]
    assert row.n_seeds == 2
    assert row.mean_rr_micro == (500000 + 1000000) // 2
    assert row.hits1_permille == 500
    assert row.hits3_permille == 1000
    assert row.hits10_permille == 1000


def test_trunc_div_matches_duckdb_integer_division(spark):
    """Round-6 ADVICE fix: the shared integer-division helper must
    TRUNCATE toward zero like DuckDB's `//` (verified -7 // 2 = -3 on
    DuckDB 1.0.0), not floor — negative non-divisible values are where
    the old sign-corrected floor silently diverged from the oracles."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.functions.precision import trunc_div

    df = spark.createDataFrame(
        [(-7,), (-6,), (-1,), (0,), (1,), (7,)], "v long"
    )
    got = {
        r["v"]: r["q"]
        for r in df.select("v", trunc_div("v", 2).alias("q")).collect()
    }
    # python's int(v / 2) truncates toward zero, matching DuckDB //
    assert got == {v: int(v / 2) for v in (-7, -6, -1, 0, 1, 7)}


def test_triangles_checkpoint_preserves_counts(spark):
    """Round-6: triangles() eagerly truncates the undirected edge list;
    the per-node counts on a graph with parallel/reverse edges and
    self-loops must be unchanged by the materialization."""
    from wikidata_qrank_spark.operators.graph import triangles

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (3, 3), (3, 4), (4, 1), (1, 4)],
        "src_id long, dst_id long",
    )
    got = {
        r["node"]: r["n_triangles"] for r in triangles(edges).collect()
    }
    # triangles: {1,2,3} and {1,3,4}
    assert got == {1: 2, 2: 1, 3: 2, 4: 1}
