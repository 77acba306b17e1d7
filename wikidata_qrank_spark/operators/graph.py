"""Graph analytics over the materialized triple graph.

The reference names PageRank as the planned next ranking signal
(doc/design.md:245-262; itemsignals.go:40 reserves a slot for it) but
never implements it — here it is, Spark-first, over the engine's own
(src_id, dst_id) edges:

* ``degrees`` — in/out degree per node (one groupBy each, full outer
  merged; the adjacency profile of the KG).
* ``pagerank`` — bounded Lloyd-style iteration: contributions =
  rank/outdeg along edges (broadcast-able rank table joined to edges),
  per-destination sum, damping. Each iteration is ONE shuffle (the
  per-dst aggregation); the rank table is ``localCheckpoint``-ed per
  round (see operators/clusters.py — without truncation the lineage
  doubles per round). Ranks are round6-ed at every iteration boundary,
  which makes the fixpoint bit-reproducible across engines: the DuckDB
  oracle evaluates the identical unrolled recurrence and value-hashes
  the result.

Semantics (deterministic, documented): N = |src ∪ dst| over the edge
set; rank_0 = round6(1/N); rank_{t+1}(v) = round6((1-d)/N +
d·Σ_{u→v} rank_t(u)/outdeg(u)); dangling mass is dropped (nodes with no
outlinks contribute nothing — the simple variant, stated in the oracle
too, so both engines agree exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.precision import round6


def degrees(edges: DataFrame, src: str = "src_id", dst: str = "dst_id") -> DataFrame:
    """(node, out_degree, in_degree) over the edge set."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).cast("long").alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).cast("long").alias("in_degree"),
        )
    )


def triangles(
    edges: DataFrame, src: str = "src_id", dst: str = "dst_id"
) -> DataFrame:
    """(node, n_triangles) — per-node triangle participation over the
    undirected simple graph (self-loops and parallel/reverse edges
    collapsed).

    Degree-ordered orientation: every undirected edge points from the
    (degree, id)-smaller endpoint to the larger, so each triangle
    a≺b≺c is generated exactly once from its ≺-smallest vertex, and
    wedge fan-out per node is bounded by its ORIENTED out-degree —
    O(√|E|) even for hubs. This is the standard trick that makes
    triangle counting survive power-law graphs; the naive per-node
    wedge join would be quadratic in hub degree. Shuffles: undirected
    dedup, degree agg, the wedge self-join on the pivot vertex, and the
    closing-edge join — all on node keys, no driver state.

    The oracle counts triangles with a plain ordered 3-way self-join —
    an independent formulation with no degree ordering.
    """
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).filter(
        F.col(src) != F.col(dst)
    )
    # eager truncation: the undirected edge list feeds SIX subtrees
    # (degree union legs, the degree joins, both wedge sides, the
    # closing join); lazy, each one re-derives the whole upstream —
    # for the KG graph that is the corpus->mention pipeline, measured
    # ~6x the edge-build cost per triangle count (round 6, guide §2.4).
    # The materialized relation is |E| rows — the algorithm's own
    # working set.
    und = (
        e.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    g = (
        und.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = g.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedge_order = (F.col("o1.dv") < F.col("o2.dv")) | (
        (F.col("o1.dv") == F.col("o2.dv")) & (F.col("o1.v") < F.col("o2.v"))
    )
    wedges = (
        o1.join(o2, (F.col("o1.u") == F.col("o2.u")) & wedge_order)
        .select(
            F.col("o1.u").alias("p"),
            F.col("o1.v").alias("q"),
            F.col("o2.v").alias("r"),
        )
    )
    closing = oriented.select(F.col("u").alias("q"), F.col("v").alias("r"))
    tri = wedges.join(closing, ["q", "r"])
    return (
        tri.select(F.explode(F.array("p", "q", "r")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src_id", dst: str = "dst_id"
) -> DataFrame:
    """(node, deg, n_triangles, cc_ppm) — local clustering coefficient
    over the undirected simple graph, as exact integer ppm:
    ``(2·tri·10⁶) div (deg·(deg−1))`` for deg ≥ 2, else 0 — so the
    aggregate is order-proof and the oracle replays it exactly.

    Triangle counts come from :func:`triangles` (degree-ordered
    orientation — the power-law-safe plan); degree is one keyed
    aggregation over the deduped undirected edge list; the final join
    is node-keyed. Nodes in no triangle keep cc_ppm 0 via the left
    join (every edge endpoint appears in ``deg``)."""
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).filter(
        F.col(src) != F.col(dst)
    )
    und = e.select(
        F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    tri = triangles(edges, src, dst)
    return (
        deg.join(tri, "node", "left")
        .withColumn(
            "n_triangles", F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
        )
        .withColumn(
            "cc_ppm",
            F.when(
                F.col("deg") >= 2,
                F.expr("(2 * n_triangles * 1000000) div (deg * (deg - 1))"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def bfs_distances(
    edges: DataFrame,
    source: int,
    max_hops: int = 6,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """(node, hops) — undirected BFS hop distance from ``source``,
    bounded by ``max_hops``. Frontier expansion is one join + one
    min-agg per hop (shuffles keyed on node), with the distance table
    ``localCheckpoint``-ed per round (lineage truncation, same rule as
    pagerank/connected components). Early exit when a frontier is
    empty. The oracle walks the same graph with a bounded recursive
    CTE — an independent formulation."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col(src) != F.col(dst)
    )
    und = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    dist = spark.createDataFrame([(source, 0)], "node long, hops long").localCheckpoint(
        eager=True
    )
    frontier = dist
    for hop in range(1, max_hops + 1):
        neighbors = (
            frontier.join(und, frontier.node == und.u)
            .select(F.col("v").alias("node"))
            .distinct()
        )
        new_nodes = neighbors.join(dist, "node", "left_anti").withColumn(
            "hops", F.lit(hop).cast("long")
        )
        new_nodes = new_nodes.localCheckpoint(eager=True)
        # DataFrame-native emptiness probe: .rdd.isEmpty() would force a
        # non-AQE RDD job per hop
        if new_nodes.limit(1).count() == 0:
            break
        dist = dist.unionByName(new_nodes).localCheckpoint(eager=True)
        frontier = new_nodes
    return dist


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """(node, rank) after ``iters`` damped iterations (see module doc)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return edges.sparkSession.createDataFrame([], "node long, rank double")
    outdeg = e.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    graph = e.join(outdeg, "u").localCheckpoint(eager=True)

    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", round6(F.lit(1.0 / n)))
    for _ in range(iters):
        contrib = (
            graph.join(ranks.withColumnRenamed("node", "u"), "u")
            .select("v", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("incoming"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("v", "node"), "node", "left")
            .select(
                "node",
                round6(
                    F.lit(base) + F.lit(damping) * F.coalesce("incoming", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def two_hop_counts(
    edges: DataFrame, src: str = "src_id", dst: str = "dst_id"
) -> DataFrame:
    """(src_id, n_two_hop) — number of DISTINCT nodes reachable in
    exactly two directed hops (excluding returning to the start).
    One self-join on the hop key + a distinct-aggregate; at scale both
    sides shuffle on the same mid-node key, so the join is
    co-partitioned, and fan-out is bounded by Σ deg(mid)² over mid
    nodes — the hub-squared term that makes this form an exact-answer
    witness only; for power-law graphs at scale use
    :func:`two_hop_approx`, whose per-mid register sketches cap the
    fan-out at min(deg, 2^bucket_bits) per mid."""
    e1 = edges.select(F.col(src).alias("a"), F.col(dst).alias("m"))
    e2 = edges.select(F.col(src).alias("m"), F.col(dst).alias("c"))
    return (
        e1.join(e2, "m")
        .filter(F.col("a") != F.col("c"))
        .groupBy(F.col("a").alias("src_id"))
        .agg(F.countDistinct("c").cast("long").alias("n_two_hop"))
    )


def two_hop_approx(
    edges: DataFrame,
    src: str = "src_id",
    dst: str = "dst_id",
    bucket_bits: int = 12,
) -> DataFrame:
    """(src_id, n_buckets, n_nonzero, n_two_hop_est) — HLL-sketched
    count of distinct two-hop-reachable nodes, the power-law-safe
    counterpart of :func:`two_hop_counts`.

    Why it scales where the exact form can't: the exact self-join
    materializes Σ_m deg_in(m)·deg_out(m) rows — hub-squared on a
    Zipf-degree graph, unbounded at 100×. Here each mid node m first
    folds its out-neighbors into HLL registers (≤ 2^bucket_bits rows
    per mid NO MATTER ITS DEGREE — a 1 M-degree hub contributes 4096
    register rows, not 1 M neighbor rows), the a→m edge join picks up
    register rows, and the per-src merge is a register-wise max
    (sketch mergeability). Join fan-out is O(|E| · min(deg, m)),
    i.e. capped, and every stage is a keyed partial aggregate.

    Registers reuse :mod:`sketches`' portable md5 primitives, so the
    DuckDB oracle derives bit-identical registers and the identical
    estimate. Approximation semantics: standard error ~1.04/√m, and
    unlike the exact form the start node itself is counted when it is
    two-hop reachable (per-src exclusion can't be expressed inside a
    mergeable sketch)."""
    from .sketches import hll_estimate_from_registers, hll_registers

    e2 = edges.select(
        F.col(src).alias("m"), F.col(dst).cast("string").alias("__c")
    )
    regs_m = hll_registers(e2, "__c", ["m"], bucket_bits)
    e1 = edges.select(F.col(src).alias("a"), F.col(dst).alias("m"))
    merged = (
        e1.join(regs_m, "m")
        .groupBy(F.col("a").alias("src_id"), F.col("__bucket"))
        .agg(F.max("__mx").alias("__mx"))
    )
    return hll_estimate_from_registers(
        merged, ["src_id"], bucket_bits
    ).withColumnRenamed("hll_estimate", "n_two_hop_est")


def neighborhood_function(
    edges: DataFrame,
    max_hops: int = 3,
    src: str = "src_id",
    dst: str = "dst_id",
    bucket_bits: int = 12,
) -> DataFrame:
    """HyperANF (Boldi-Rosa-Vigna, WWW 2011): per-node HLL-sketched
    size of the directed out-ball — (node, hops, n_buckets, n_nonzero,
    n_reachable_est) for hops = 1..max_hops, where the estimate counts
    every node reachable within ≤ hops edges INCLUDING the start node
    (c₀ = HLL{v}; per-source exclusion can't live inside a mergeable
    sketch).

    The recurrence is pure register algebra: cₕ(v) = merge(cₕ₋₁(v),
    cₕ₋₁(u) for v→u), i.e. one edge join + one (node, bucket) max per
    round. Per-node state is ≤ 2^bucket_bits register rows no matter
    the degree or ball size — the property that makes the neighborhood
    function computable where exact h-hop BFS sets blow up hub^h on a
    power-law graph (:func:`two_hop_approx` is the h=2 special case).
    Each round's registers persist (they feed the next round AND the
    estimate — the diamond-reuse rule); the rounds are max_hops keyed
    shuffles, nothing driver-side.

    Registers reuse :mod:`sketches`' portable md5 primitives, so the
    DuckDB oracle derives bit-identical registers and estimates for
    every round."""
    from functools import reduce

    from .sketches import hll_estimate_from_registers, hll_registers

    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    # EAGER truncation, not lazy persist: the per-round register tables
    # and the edge relation each feed SEVERAL independent downstream
    # branches (next round + that round's estimate + the final union).
    # A lazy cache lets those branches launch concurrently against the
    # still-unmaterialized relation and RACE-recompute its whole
    # upstream (measured: 44 s vs 10 s at sf0.1 when edges derive from
    # the mention pipeline); eager localCheckpoint computes each round
    # exactly once and keeps the loop's lineage flat.
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    regs = hll_registers(
        nodes.withColumn("__c", F.col("node").cast("string")),
        "__c",
        ["node"],
        bucket_bits,
    ).localCheckpoint(eager=True)
    rounds = []
    for h in range(1, max_hops + 1):
        nbr = e.join(regs.withColumnRenamed("node", "v"), "v").select(
            F.col("u").alias("node"), "__bucket", "__mx"
        )
        regs = (
            regs.unionByName(nbr)
            .groupBy("node", "__bucket")
            .agg(F.max("__mx").alias("__mx"))
            .localCheckpoint(eager=True)
        )
        rounds.append(
            hll_estimate_from_registers(regs, ["node"], bucket_bits).withColumn(
                "hops", F.lit(h).cast("long")
            )
        )
    out = reduce(lambda a, b: a.unionByName(b), rounds)
    return out.select(
        "node",
        "hops",
        "n_buckets",
        "n_nonzero",
        F.col("hll_estimate").alias("n_reachable_est"),
    )


def cooccurrence_pmi(
    mentions_df: DataFrame, min_pairs: int = 2
) -> DataFrame:
    """(item_a, item_b, n_ab, pmi) — pointwise mutual information
    between entities co-mentioned in the same document:
    pmi = ln(n_ab · N / (n_a · n_b)), item_a < item_b, n_ab ≥
    ``min_pairs``. The association-mining signal a KG uses to propose
    candidate relations beyond adjacency.

    Shape: distinct (doc, item) incidence → per-item doc frequency
    (KB-scale dim) → same-doc pair join (work ∝ Σ mentions-per-doc²,
    the classic market-basket bound) → one integer-product expression.
    All products stay BIGINT, a single final division feeds ln(), so
    both engines produce bit-identical doubles."""
    from ..functions.precision import round6

    inc = mentions_df.select("doc_id", "item_id").distinct()
    # corpus size enters as a broadcast 1-row aggregate INSIDE the lazy
    # plan (the lm_buckets pattern) — a driver-side .count() here would
    # execute the whole mentions lineage an extra time at call time
    nd = inc.agg(F.countDistinct("doc_id").cast("long").alias("__n_docs"))
    df_dim = inc.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_item")
    )
    a = inc.select("doc_id", F.col("item_id").alias("item_a"))
    b = inc.select("doc_id", F.col("item_id").alias("item_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    da = df_dim.select(
        F.col("item_id").alias("item_a"), F.col("n_docs_item").alias("n_a")
    )
    db = df_dim.select(
        F.col("item_id").alias("item_b"), F.col("n_docs_item").alias("n_b")
    )
    # NO broadcast hint on the per-item doc-frequency dim: it scales
    # with the knowledge base (~100 M items at wiki scale — the same
    # size class mentions.py guards with DictionaryTooLargeError), far
    # past broadcast limits. AQE picks broadcast at test scale on its
    # own; only the 1-row corpus-size aggregate keeps the hint.
    return (
        pairs.join(da, "item_a")
        .join(db, "item_b")
        .join(F.broadcast(nd))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            round6(
                F.log(
                    (F.col("n_ab") * F.col("__n_docs"))
                    / (F.col("n_a") * F.col("n_b"))
                )
            ).alias("pmi"),
        )
    )


def reciprocity(edges: DataFrame, src: str = "src_id", dst: str = "dst_id") -> DataFrame:
    """(node, n_out, n_reciprocal, reciprocity) — per-node fraction of
    out-edges whose reverse edge also exists (mutual-link rate, a
    standard directed-graph health metric; in the KG it separates
    symmetric relations from one-way references). One left-semi
    self-join on the reversed key + two counts; shuffles are
    edge-keyed."""
    from ..functions.precision import round6

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col(src) != F.col(dst)
    ).distinct()
    rev = e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    mutual = e.join(rev, ["u", "v"], "left_semi")
    out_d = e.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("n_out")
    )
    mut_d = mutual.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("n_reciprocal")
    )
    return (
        out_d.join(mut_d, "node", "left")
        .select(
            "node",
            "n_out",
            F.coalesce("n_reciprocal", F.lit(0)).cast("long").alias("n_reciprocal"),
            round6(
                F.coalesce("n_reciprocal", F.lit(0)) / F.col("n_out")
            ).alias("reciprocity"),
        )
    )


def k_core(
    edges: DataFrame,
    k: int = 2,
    max_rounds: int = 8,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """(node, core_degree) — nodes surviving ``max_rounds`` of k-core
    peeling over the undirected simple graph, with their degree inside
    the surviving subgraph.

    Each round removes every node whose current degree is < k, then
    recomputes degrees over the induced subgraph; at a fixpoint the
    result IS the classical k-core. The round count is FIXED (and the
    oracle unrolls the identical recurrence) so both engines compute
    the same set even on inputs that have not converged — extra rounds
    at a fixpoint are no-ops, and the loop exits early when a round
    removes nothing.

    Scale: each round is one degree aggregation (shuffle keyed on
    node) plus two left-semi joins filtering the edge list — work
    bounded by the surviving edge count, monotonically shrinking.
    Lineage is truncated per round (``localCheckpoint``; see
    operators/clusters.py for why), so plans stay flat regardless of
    round count. No collect; the only driver-side values are the
    per-round survivor counts used for the early exit.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    und = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = -1
    for _ in range(max_rounds):
        deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("u")
        n_keep = keep.count()
        if n_keep == prev:
            break
        prev = n_keep
        und = (
            und.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        und.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        .filter(F.col("core_degree") >= k)
    )


def hits(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """(node, hub, authority) — HITS after ``iters`` mutual-update
    iterations with L1 normalization, round6-ed at every boundary so
    the float fixpoint is identical to the unrolled SQL oracle (the
    same bit-reproducibility contract as :func:`pagerank`).

    Recurrence (deterministic, stated in the oracle too): start
    h_0 = a_0 = round6(1/N) over N = |src ∪ dst|; then
    a'(v) = Σ_{u→v} h(u), h'(u) = Σ_{u→v} a'(v) — the half-step
    ordering (authorities from CURRENT hubs, hubs from the NEW
    authorities) — each followed by L1 normalization and round6.
    Nodes missing a side score 0.

    Scale: per iteration, two edge-keyed join+agg shuffles (the score
    tables are node-sized — AQE broadcasts them when small, sort-merge
    on the node key otherwise) and two 1-row L1 sums; lineage truncated
    per round. Dense hubs fan IN through an aggregation, never a
    row-multiplying self-join.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return edges.sparkSession.createDataFrame(
            [], "node long, hub double, authority double"
        )
    graph = e.localCheckpoint(eager=True)
    init = round6(F.lit(1.0 / n))
    scores = nodes.select("node", init.alias("hub"), init.alias("authority"))

    def _l1_norm(df: DataFrame, col: str) -> DataFrame:
        total = df.agg(F.sum(col).alias("_t"))
        return (
            df.join(F.broadcast(total))
            .withColumn(
                col,
                F.when(F.col("_t") > 0, round6(F.col(col) / F.col("_t")))
                .otherwise(F.lit(0.0)),
            )
            .drop("_t")
        )

    for _ in range(iters):
        auth = (
            graph.join(
                scores.select(F.col("node").alias("u"), "hub"), "u"
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("hub").alias("authority"))
        )
        auth = _l1_norm(auth, "authority")
        hub = (
            graph.join(
                auth.select(F.col("node").alias("v"), "authority"), "v"
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.sum("authority").alias("hub"))
        )
        hub = _l1_norm(hub, "hub")
        scores = (
            nodes.join(hub, "node", "left")
            .join(auth, "node", "left")
            .select(
                "node",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            )
            .localCheckpoint(eager=True)
        )
    return scores


def _undirected_simple(
    edges: DataFrame, src: str, dst: str
) -> DataFrame:
    """Distinct undirected simple edge set (both directions present,
    self-loops dropped), lineage-truncated once at the base."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    return (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """(node, community) — synchronous mode label propagation (LPA
    community detection) over the undirected simple graph, ``rounds``
    iterations.

    Deterministic recurrence (the oracle unrolls the identical CTEs):
    lbl_0(v) = v; lbl_{t+1}(v) = the most frequent label among v's
    neighbors at time t, ties broken toward the SMALLEST label. Every
    node in the edge set has >= 1 neighbor, so the update is total. At
    a fixpoint further rounds are no-ops, so a fixed round count keeps
    both engines in lockstep even when the loop exits early (a round
    that changes no label).

    Scale: per round one edge-keyed join (labels are node-sized — AQE
    broadcasts when small, sort-merge on the node key otherwise), one
    (node, label) count aggregation, and one per-node top-1 window —
    all shuffles keyed on the node, bounded by |E|; no row-multiplying
    self-join. Lineage is truncated per round (``localCheckpoint``,
    see operators/clusters.py), so the plan stays flat for any round
    count.
    """
    from pyspark.sql import Window

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    und = _undirected_simple(edges, src, dst)
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("lbl").asc()
    )
    for _ in range(rounds):
        new = (
            und.join(
                labels.select(F.col("node").alias("v"), "lbl"), "v"
            )
            .groupBy(F.col("u").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
            .localCheckpoint(eager=True)
        )
        n_changed = (
            new.join(
                labels.select("node", F.col("lbl").alias("lbl_old")), "node"
            )
            .filter(F.col("lbl") != F.col("lbl_old"))
            .count()
        )
        labels = new
        if n_changed == 0:
            break
    return labels.select("node", F.col("lbl").alias("community"))


def harmonic_centrality(
    edges: DataFrame,
    n_landmarks: int = 8,
    max_hops: int = 4,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """(node, harmonic_num, harmonic) — landmark-approximated harmonic
    centrality over the undirected simple graph: bounded multi-source
    BFS from the ``n_landmarks`` smallest node ids, then
    harmonic(v) = Σ_{lm ≠ v reached} 1/dist(lm, v) truncated at
    ``max_hops`` hops.

    Exactness contract: per-landmark contributions are summed as the
    INTEGER numerator ``harmonic_num`` = Σ L/dist with
    L = lcm(1..max_hops) (12 for the default 4), so the aggregate is
    order-proof exact integer math — the same trick as the HLL
    register fold; ``harmonic`` = harmonic_num / L is one final
    division from identical integers in both engines. The oracle
    unrolls the identical per-hop min-distance recurrence.

    Scale: landmark selection is a sort-limit on the node dim (k rows
    collect nothing); each hop is one frontier⋈edges join plus a
    (lm, node) min-aggregation — state is at most
    n_landmarks × |nodes| rows, shuffles keyed on the node, frontier
    shrinks as distances settle. Lineage truncated per hop. This is
    the standard landmark/pivot approximation (Eppstein–Wang) — exact
    closeness needs all-pairs, which is not a 100 TB operation.
    """
    import math

    if n_landmarks < 1:
        raise ValueError(f"n_landmarks must be >= 1, got {n_landmarks}")
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    scale = math.lcm(*range(1, max_hops + 1))
    und = _undirected_simple(edges, src, dst)
    nodes = und.select(F.col("u").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    lms = nodes.orderBy("node").limit(n_landmarks)
    dist = lms.select(
        F.col("node").alias("lm"),
        "node",
        F.lit(0).cast("long").alias("hops"),
    ).localCheckpoint(eager=True)
    for r in range(1, max_hops + 1):
        frontier = dist.filter(F.col("hops") == r - 1)
        cand = frontier.join(
            und.select(F.col("u").alias("node"), "v"), "node"
        ).select("lm", F.col("v").alias("node"), F.lit(r).cast("long").alias("hops"))
        dist = (
            dist.unionByName(cand)
            .groupBy("lm", "node")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint(eager=True)
        )
    # integer floor division per term, summed as longs — textually the
    # oracle's sum(scale // hops): the old float-sum-cast-to-long was
    # exact only while lcm(1..max_hops) stayed below 2^53 (round-5
    # ADVICE finding)
    contrib = dist.filter(F.col("hops") > 0).groupBy("node").agg(
        F.sum(F.expr(f"{scale} div hops")).cast("long").alias("harmonic_num")
    )
    return nodes.join(contrib, "node", "left").select(
        "node",
        F.coalesce("harmonic_num", F.lit(0)).cast("long").alias("harmonic_num"),
        (
            F.coalesce("harmonic_num", F.lit(0)).cast("long")
            / F.lit(float(scale))
        ).alias("harmonic"),
    )


def personalized_pagerank(
    edges: DataFrame,
    n_seeds: int = 3,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """(node, rank) — personalized PageRank: the damped walk restarts
    at a SEED SET (the ``n_seeds`` smallest node ids — deterministic)
    instead of uniformly, so ranks measure relatedness TO the seeds,
    the entity-relatedness signal used for topic-conditioned entity
    ranking. Same deterministic recurrence contract as
    :func:`pagerank` (round6 per boundary, dangling mass dropped,
    oracle unrolls the identical CTEs):

    s(v) = 1/n_seeds on seeds else 0; rank_0 = round6(s);
    rank_{t+1}(v) = round6((1-d)·s(v) + d·Σ_{u→v} rank_t(u)/outdeg(u)).

    (If the graph has fewer than n_seeds nodes, both engines still
    divide by n_seeds — total mass shrinks but they agree exactly.)

    Scale: identical plan shape to pagerank — per iteration one
    edge-keyed join + per-dst sum; the seed indicator is a node-dim
    left join (n_seeds rows — always broadcast-able); lineage
    truncated per round.
    """
    if n_seeds < 1:
        raise ValueError(f"n_seeds must be >= 1, got {n_seeds}")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes.count() == 0:
        return edges.sparkSession.createDataFrame([], "node long, rank double")
    outdeg = e.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    graph = e.join(outdeg, "u").localCheckpoint(eager=True)
    seeds = nodes.orderBy("node").limit(n_seeds).withColumn(
        "is_seed", F.lit(True)
    )
    marked = nodes.join(F.broadcast(seeds), "node", "left").select(
        "node", F.coalesce("is_seed", F.lit(False)).alias("is_seed")
    ).localCheckpoint(eager=True)
    seed0 = 1.0 / n_seeds
    base_seed = (1.0 - damping) * (1.0 / n_seeds)
    base_expr = F.when(F.col("is_seed"), F.lit(base_seed)).otherwise(F.lit(0.0))
    ranks = marked.select(
        "node",
        "is_seed",
        F.when(F.col("is_seed"), round6(F.lit(seed0)))
        .otherwise(F.lit(0.0))
        .alias("rank"),
    )
    for _ in range(iters):
        contrib = (
            graph.join(
                ranks.select(F.col("node").alias("u"), "rank"), "u"
            )
            .select("v", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("incoming"))
        )
        ranks = (
            marked.join(contrib.withColumnRenamed("v", "node"), "node", "left")
            .select(
                "node",
                "is_seed",
                round6(
                    base_expr
                    + F.lit(damping) * F.coalesce("incoming", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "rank")


def assortativity(
    edges: DataFrame, src: str = "src_id", dst: str = "dst_id"
) -> DataFrame:
    """One row — (n_edges, assortativity): the directed out-in degree
    assortativity coefficient (Newman 2002), i.e. the Pearson
    correlation between out-degree(u) and in-degree(v) over directed
    edges u→v. Negative on disassortative graphs (hubs point at
    leaves — the typical KG/web shape), positive when hubs link hubs.

    Scale shape: two node-keyed degree aggregations, two edge-keyed
    joins to attach (x, y) per edge (AQE broadcasts the degree dims
    when small, sort-merge on the node key otherwise), then a single
    map-side-combinable fold of EXACT integer sums (n, Σx, Σy, Σx²,
    Σy², Σxy as BIGINT) — the Pearson ratio is formed once on the
    driver-free final row, so the result is bit-stable under any
    aggregation order. Overflow headroom: Σx² ≤ |E|·max_deg², within
    int64 for |E|·max_deg² < 9.2e18 (at wiki scale |E|≈1e9,
    max_deg≈1e6 exceeds it — shift to DECIMAL(38,0) sums there; the
    expression shape is unchanged).

    Zero variance on either margin (e.g. a perfect cycle) yields NULL
    rather than 0/0."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    dout = e.groupBy("u").agg(F.count(F.lit(1)).alias("x"))
    din = e.groupBy("v").agg(F.count(F.lit(1)).alias("y"))
    xy = e.join(dout, "u").join(din, "v")
    s = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    n = F.col("n_edges")
    cov = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    r = F.when(
        (vx > 0) & (vy > 0), round6(cov / (F.sqrt(vx) * F.sqrt(vy)))
    )
    return s.select("n_edges", r.alias("assortativity"))


def effective_diameter(
    edges: DataFrame,
    max_hops: int = 3,
    q_permille: int = 900,
    src: str = "src_id",
    dst: str = "dst_id",
    bucket_bits: int = 12,
) -> DataFrame:
    """HyperANF distance distribution + effective diameter (Palmer's
    ANF / Boldi-Rosa-Vigna): rows (hops, n_pairs_micro,
    eff_diameter) for hops = 0..max_hops, where n_pairs_micro is the
    sketched count of reachable (source, target) pairs within ≤ hops
    edges in integer MICRO units, and eff_diameter is the (q‰)
    effective diameter — the interpolated hop count at which q‰ of all
    max_hops-reachable pairs are covered — repeated on every row.

    Exact-integer discipline: per-(node, hops) HLL estimates from
    :func:`neighborhood_function` are snapped to micro units
    (floor(est·1e6 + 0.5) as BIGINT) BEFORE the global sum, so the
    graph-wide fold is order-free integer addition — summing raw
    doubles over a 100 M-node frame would make the total depend on
    aggregation order and break cross-engine parity. Hop 0 is the
    exact node count (every node reaches itself). The quantile test
    runs in integer space (n·1000 ≥ q‰·max); only the final
    interpolation divides, on one row.

    Scale: inherits HyperANF's bounds (≤ 2^bucket_bits register rows
    per node per round); the distribution fold adds one map-side
    combinable sum per hop; the window runs over max_hops+1 rows —
    constant-size by construction."""
    from pyspark.sql import Window

    if not 0 < q_permille <= 1000:
        raise ValueError(f"q_permille must be in (0, 1000], got {q_permille}")
    # one upstream execution total: checkpoint the edge relation here
    # and feed BOTH the register recurrence and the node count from it
    edges = edges.select(
        F.col(src).alias(src), F.col(dst).alias(dst)
    ).localCheckpoint(eager=True)
    nf = neighborhood_function(edges, max_hops, src, dst, bucket_bits)
    per_hop = nf.groupBy("hops").agg(
        F.sum(
            F.floor(F.col("n_reachable_est") * 1000000.0 + 0.5).cast("long")
        ).alias("n_pairs_micro")
    )
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    n_nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .count()
    )
    spark = edges.sparkSession
    hop0 = spark.createDataFrame(
        [(0, n_nodes * 1000000)], "hops long, n_pairs_micro long"
    )
    dist = per_hop.unionByName(hop0)
    # constant-size frame (max_hops+1 rows): a single-partition window
    # is the right plan here, not a scale concern
    w = Window.orderBy("hops")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_total = dist.select(
        "hops",
        "n_pairs_micro",
        F.max("n_pairs_micro").over(wall).alias("total_micro"),
        F.lag("n_pairs_micro").over(w).alias("prev_micro"),
    )
    sat = (
        F.col("n_pairs_micro") * 1000
        >= F.lit(q_permille) * F.col("total_micro")
    )
    prev_sat = (
        F.col("prev_micro") * 1000
        >= F.lit(q_permille) * F.col("total_micro")
    )
    first_sat = sat & (
        F.col("prev_micro").isNull() | ~prev_sat
    )
    target = (
        F.lit(q_permille).cast("double")
        * F.col("total_micro").cast("double")
    ) / 1000.0
    interp = F.when(F.col("hops") == 0, F.lit(0.0)).otherwise(
        (F.col("hops") - 1).cast("double")
        + (target - F.col("prev_micro").cast("double"))
        / (F.col("n_pairs_micro") - F.col("prev_micro")).cast("double")
    )
    staged = with_total.select(
        "hops",
        "n_pairs_micro",
        F.when(first_sat, round6(interp)).alias("eff_at"),
    )
    return staged.select(
        "hops",
        "n_pairs_micro",
        F.max("eff_at").over(wall).alias("eff_diameter"),
    )


def link_prediction(
    edges: DataFrame,
    max_mid_degree: int = 64,
    min_common: int = 2,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """Link-prediction scores over the undirected simple graph: for
    every unordered node pair (a < b) sharing ≥ min_common common
    neighbors through mids of degree ≤ max_mid_degree, emit
    (node_a, node_b, n_common, deg_a, deg_b, jaccard, aa_micro,
    is_edge) — common-neighbor count, neighborhood Jaccard
    n∩/(deg_a + deg_b − n∩) over FULL degrees, and the Adamic-Adar
    score Σ_mid 1/ln(deg(mid)) in integer micro units (each mid's
    1e6/ln(deg) contribution is snapped to a BIGINT before the
    per-pair sum, so the fold is order-free — summing raw doubles
    would tie the value to aggregation order).

    The mid-degree cap is the standard stop-hub rule of
    common-neighbor methods AND the scale bound: wedge fan-out through
    a mid is deg², so uncapped Zipf hubs contribute the same hub²
    blowup two_hop_counts documents — capping at D bounds the
    candidate join at |E|·D while barely moving the scores (a
    1 M-degree hub contributes 1/ln(1e6) ≈ 0.07 per pair and connects
    everything to everything — noise, not signal). Mids with degree 1
    cannot form a wedge, so ln(deg) ≥ ln 2 and the micro contribution
    is finite. is_edge marks pairs already adjacent (link prediction
    ranks the non-edges; downstream filters on it)."""
    if max_mid_degree < 2:
        raise ValueError(
            f"max_mid_degree must be >= 2, got {max_mid_degree}"
        )
    und = _undirected_simple(edges, src, dst)
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    mids = deg.filter(
        (F.col("deg") >= 2) & (F.col("deg") <= max_mid_degree)
    ).select(F.col("u").alias("mid"), F.col("deg").alias("mid_deg"))
    adj = und.select(F.col("u").alias("mid"), F.col("v").alias("x")).join(
        mids, "mid"
    )
    a1 = adj.select("mid", "mid_deg", F.col("x").alias("node_a"))
    a2 = adj.select("mid", F.col("x").alias("node_b"))
    contrib = F.floor(
        1000000.0 / F.log(F.col("mid_deg").cast("double")) + 0.5
    ).cast("long")
    pairs = (
        a1.join(a2, "mid")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum(contrib).alias("aa_micro"),
        )
        .filter(F.col("n_common") >= min_common)
    )
    scored = (
        pairs.join(
            deg.select(F.col("u").alias("node_a"), F.col("deg").alias("deg_a")),
            "node_a",
        )
        .join(
            deg.select(F.col("u").alias("node_b"), F.col("deg").alias("deg_b")),
            "node_b",
        )
    )
    ecols = und.select(
        F.col("u").alias("node_a"), F.col("v").alias("node_b"),
        F.lit(True).alias("is_edge"),
    )
    return (
        scored.join(ecols, ["node_a", "node_b"], "left")
        .select(
            "node_a",
            "node_b",
            "n_common",
            "deg_a",
            "deg_b",
            round6(
                F.col("n_common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("jaccard"),
            "aa_micro",
            F.coalesce("is_edge", F.lit(False)).alias("is_edge"),
        )
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """DeepWalk-style walk corpus (Perozzi 2014), fully deterministic:
    (start_node, walk_no, step, node) — walks_per_node uniform random
    walks of walk_len steps from every node of the undirected simple
    graph, the sequence corpus a skip-gram KG-embedding trainer
    consumes. Step t from node c follows c's idx-th neighbor where
    neighbors are ranked by id (row_number − 1) and
    idx = hash60(start|walk_no|t) mod deg(c) — the portable md5 hash,
    so the DuckDB oracle replays the identical walks bit-for-bit and a
    re-run on different partitioning picks the identical corpus (no
    Math.random, no per-partition RNG state).

    Scale shape: the ranked adjacency (one row_number window keyed by
    node) and the degree dim are built ONCE; each step is two
    node-keyed equi-joins — frontier⋈deg to form the pick, then
    frontier⋈adjacency on (node, idx = pick), which probes exactly one
    neighbor row per walk instead of fanning out deg rows and
    filtering. Frontier size is constant (|V|·walks_per_node rows per
    step); per-step lineage is truncated so the plan stays flat for
    long walks. Undirected adjacency guarantees every node in the edge
    set has deg ≥ 1 — walks never dead-end."""
    from pyspark.sql import Window

    from ..functions.hashing import hash60

    if walk_len < 1:
        raise ValueError(f"walk_len must be >= 1, got {walk_len}")
    if walks_per_node < 1:
        raise ValueError(
            f"walks_per_node must be >= 1, got {walks_per_node}"
        )
    und = _undirected_simple(edges, src, dst)
    wn = Window.partitionBy("u").orderBy("v")
    adj = und.select(
        F.col("u").alias("node"),
        (F.row_number().over(wn) - 1).cast("long").alias("idx"),
        F.col("v").alias("nxt"),
    ).localCheckpoint(eager=True)
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    starts = und.select(F.col("u").alias("start_node")).distinct()
    wnos = edges.sparkSession.range(walks_per_node).select(
        F.col("id").alias("walk_no")
    )
    frontier = starts.crossJoin(F.broadcast(wnos)).select(
        "start_node", "walk_no", F.col("start_node").alias("cur")
    )
    out = frontier.select(
        "start_node", "walk_no", F.lit(0).cast("long").alias("step"),
        F.col("cur").alias("node"),
    )
    for t in range(1, walk_len + 1):
        key = F.concat_ws(
            "|",
            F.col("start_node").cast("string"),
            F.col("walk_no").cast("string"),
            F.lit(str(t)),
        )
        picked = frontier.join(
            deg.withColumnRenamed("node", "cur"), "cur"
        ).select(
            "start_node", "walk_no",
            F.col("cur").alias("node"),
            (hash60(key) % F.col("deg")).alias("idx"),
        )
        frontier = (
            picked.join(adj, ["node", "idx"])
            .select("start_node", "walk_no", F.col("nxt").alias("cur"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            frontier.select(
                "start_node", "walk_no",
                F.lit(t).cast("long").alias("step"),
                F.col("cur").alias("node"),
            )
        )
    return out


def transe_step(
    edges: DataFrame,
    dim: int = 8,
    lr_denom: int = 100,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """One exact full-batch gradient step of a TransE-style (Bordes
    2013) translation embedding over the edge set — the KG-embedding
    bootstrap, distributed and bit-deterministic: rows (node, dim,
    emb0_micro, grad_micro, emb1_micro).

    Semantics (single relation type, squared translation loss
    L = Σ_{(h,t)} Σ_d (e_h[d] + r[d] − e_t[d])²): embeddings and the
    relation vector initialize from the portable hash —
    emb0_micro(v, d) = (hash60(v|d) mod 2001 − 1000)·1000, i.e. a
    deterministic lattice in [−1, 1] at 1e−3 resolution — so BOTH
    engines derive identical starting points with no RNG. The gradient
    for e_h is +2·diff and for e_t is −2·diff per incident edge
    (diff = e_h + r − e_t, an exact micro-int), summed per (node, dim)
    — order-free integer folds. The update divides by lr_denom
    (lr = 1/lr_denom) with TRUNCATING integer division — the
    semantics Spark's ``div`` and DuckDB's ``//`` natively share —
    keeping every quantity an exact BIGINT end to end: no float
    enters the recurrence, so chained steps stay in lockstep across
    engines (round-5 ADVICE: the old sign-corrected floor diverged
    from ``//`` on negative non-divisible gradients).

    Scale shape: edges×dim diff rows (dim a small constant) from one
    node-keyed join against the (node×dim) embedding relation on each
    endpoint; gradients are two keyed partial-aggregated sums unioned
    then folded — every shuffle is (node, dim)-keyed and
    map-side-combined; the relation vector is a dim-row literal. A
    production trainer adds margin negatives (operators/negatives.py
    supplies them) and loops steps — each step is this same
    one-shuffle shape with lineage truncation."""
    from ..functions.hashing import hash60
    from ..functions.precision import trunc_div

    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if lr_denom < 1:
        raise ValueError(f"lr_denom must be >= 1, got {lr_denom}")
    spark = edges.sparkSession
    # eager truncation: e feeds the node derivation (twice) and the
    # diff join; emb0 feeds both endpoint joins and the final update —
    # lazy persist would let those branches race-recompute upstream
    # (the HyperANF lesson)
    e = edges.select(
        F.col(src).alias("h"), F.col(dst).alias("t")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("h").alias("node"))
        .unionByName(e.select(F.col("t").alias("node")))
        .distinct()
    )
    dims = spark.range(dim).select(F.col("id").cast("long").alias("dim"))
    emb0 = nodes.crossJoin(F.broadcast(dims)).select(
        "node",
        "dim",
        (
            (
                hash60(
                    F.concat_ws(
                        "|",
                        F.col("node").cast("string"),
                        F.col("dim").cast("string"),
                    )
                )
                % 2001
                - 1000
            )
            * 1000
        ).alias("emb0_micro"),
    ).localCheckpoint(eager=True)
    rel = dims.select(
        "dim",
        (
            (hash60(F.concat(F.lit("r|"), F.col("dim").cast("string"))) % 2001 - 1000)
            * 1000
        ).alias("r_micro"),
    )
    diffs = (
        e.join(
            emb0.select(
                F.col("node").alias("h"), "dim",
                F.col("emb0_micro").alias("eh"),
            ),
            "h",
        )
        .join(
            emb0.select(
                F.col("node").alias("t"), "dim",
                F.col("emb0_micro").alias("et"),
            ),
            ["t", "dim"],
        )
        .join(F.broadcast(rel), "dim")
        .select(
            "h",
            "t",
            "dim",
            (F.col("eh") + F.col("r_micro") - F.col("et")).alias("diff"),
        )
    )
    # both endpoint gradients in ONE pass: explode each diff row into
    # its two (node, contribution) halves map-side, then a single
    # (node, dim)-keyed fold — no diamond over the diff relation, so
    # nothing to cache and one shuffle instead of two plus a union
    contribs = diffs.select(
        "dim",
        F.explode(
            F.array(
                F.struct(
                    F.col("h").alias("node"),
                    (F.lit(2) * F.col("diff")).alias("g"),
                ),
                F.struct(
                    F.col("t").alias("node"),
                    (F.lit(-2) * F.col("diff")).alias("g"),
                ),
            )
        ).alias("c"),
    ).select(F.col("c.node").alias("node"), "dim", F.col("c.g").alias("g"))
    grad = contribs.groupBy("node", "dim").agg(
        F.sum("g").cast("long").alias("grad_micro")
    )
    out = emb0.join(grad, ["node", "dim"], "left").select(
        "node",
        "dim",
        "emb0_micro",
        F.coalesce("grad_micro", F.lit(0)).cast("long").alias("grad_micro"),
    )
    return out.select(
        "node",
        "dim",
        "emb0_micro",
        "grad_micro",
        (
            F.col("emb0_micro")
            - trunc_div("grad_micro", lr_denom)
        ).cast("long").alias("emb1_micro"),
    )


def edge_support(
    edges: DataFrame, src: str = "src_id", dst: str = "dst_id"
) -> DataFrame:
    """(node_a, node_b, support) — per-edge triangle support over the
    undirected simple graph (a < b): how many triangles contain the
    edge, 0 for triangle-free edges (kept via the left join). Support
    is THE k-truss quantity and a sharper tie-strength signal than
    endpoint degrees.

    Triangles enumerate once each via the same degree-ordered
    orientation as :func:`triangles` (wedge fan-out bounded by oriented
    out-degree — hub-safe); each triangle then credits its three edges
    through one explode + (a, b)-keyed count. The oracle recounts with
    a plain ordered 3-way self-join."""
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).filter(
        F.col(src) != F.col(dst)
    )
    und = e.select(
        F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
    ).distinct()
    return _edge_support_on_und(und)


def _edge_support_on_und(und: DataFrame) -> DataFrame:
    """Support over an already-normalized (a < b) distinct edge set —
    the per-round kernel :func:`k_truss` re-invokes on the surviving
    edges."""
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    g = (
        und.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = g.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedge_order = (F.col("o1.dv") < F.col("o2.dv")) | (
        (F.col("o1.dv") == F.col("o2.dv")) & (F.col("o1.v") < F.col("o2.v"))
    )
    tri = (
        o1.join(o2, (F.col("o1.u") == F.col("o2.u")) & wedge_order)
        .select(
            F.col("o1.u").alias("p"),
            F.col("o1.v").alias("q"),
            F.col("o2.v").alias("r"),
        )
        .join(oriented.select(F.col("u").alias("q"), F.col("v").alias("r")), ["q", "r"])
    )
    tri_edges = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("p", "q").alias("a"), F.greatest("p", "q").alias("b")
                ),
                F.struct(
                    F.least("p", "r").alias("a"), F.greatest("p", "r").alias("b")
                ),
                F.struct(
                    F.least("q", "r").alias("a"), F.greatest("q", "r").alias("b")
                ),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    sup = tri_edges.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    return und.join(sup, ["a", "b"], "left").select(
        F.col("a").alias("node_a"),
        F.col("b").alias("node_b"),
        F.coalesce("support", F.lit(0)).cast("long").alias("support"),
    )


def k_truss(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 3,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """(node_a, node_b, support) — the edges surviving ``rounds``
    synchronous peeling iterations toward the k-truss (every edge in
    ≥ k−2 triangles among surviving edges), support as of the LAST
    recount. Fixed round count (with early exit when a round peels
    nothing) keeps both engines in lockstep — at a fixpoint further
    rounds are no-ops, the same contract as k_core's peeling.

    Per round: one support recount (the degree-ordered triangle
    kernel — hub-safe) + one filter; the surviving edge set is
    localCheckpoint-ed per round (flat lineage, and each round's set
    feeds BOTH the recount and the next round — the diamond rule the
    HyperANF race taught)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).filter(
        F.col(src) != F.col(dst)
    )
    und = (
        e.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sup = _edge_support_on_und(und)
    n_edges = und.count()
    for _ in range(rounds):
        kept = sup.filter(F.col("support") >= F.lit(k - 2))
        und = kept.select(
            F.col("node_a").alias("a"), F.col("node_b").alias("b")
        ).localCheckpoint(eager=True)
        sup = _edge_support_on_und(und)
        n_after = und.count()
        if n_after == n_edges:
            break
        n_edges = n_after
    return sup.select("node_a", "node_b", "support")


def degree_histogram(
    edges: DataFrame, src: str = "src_id", dst: str = "dst_id"
) -> DataFrame:
    """(side, degree, n_nodes) — the degree distribution of each
    endpoint role ('out' over src, 'in' over dst): the first plot of
    any graph audit and the skew evidence that picks join strategies
    (a heavy tail says salt/AQE-skew the node-keyed joins; a flat one
    says don't bother). Two keyed counts + one count-of-counts each —
    output is O(distinct degrees), tiny at any graph size."""
    out_h = (
        edges.groupBy(F.col(src).alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .select(F.lit("out").alias("side"), F.col("degree").cast("long"), "n_nodes")
    )
    in_h = (
        edges.groupBy(F.col(dst).alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .select(F.lit("in").alias("side"), F.col("degree").cast("long"), "n_nodes")
    )
    return out_h.unionByName(in_h)


def weighted_pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_permille: int = 850,
    src: str = "src_id",
    dst: str = "dst_id",
    weight_col: str = "weight_micro",
) -> DataFrame:
    """(node, rank_micro) — PageRank over WEIGHTED edges (contributions
    proportional to edge weight within each source's outgoing mass) in
    PURE BIGINT arithmetic: rank₀ = 1e6 div n micro; per iteration,
    each edge u→v contributes (rank_u·w_uv) div W_u (W_u = Σ w_u·,
    integer floor division), incoming sums as exact BIGINTs, and
    rank' = base + (d‰·incoming) div 1000 with base =
    ((1000−d‰)·1e6) div (1000·n). No float enters the recurrence —
    unlike a float-sum PageRank, the fold is aggregation-order-free BY
    CONSTRUCTION, so engines stay in lockstep for any iteration count
    (the transe_step discipline applied to ranking). The deliberate
    cost: each edge's floor drops < 1 micro, so total mass bleeds
    ≤ |E| micro per iteration — irrelevant for ranking (relative
    order), stated for exactness.

    Scale shape identical to :func:`pagerank`: per iteration one
    edge-keyed join against the node-sized rank table and one
    dst-keyed partial-aggregated sum; rank table localCheckpoint-ed
    per round. Natural input: the distance-weighted co-occurrence
    relation (links.windowed_cooccurrence), giving a soft-relation
    centrality the unweighted walk can't express."""
    if not 0 < damping_permille < 1000:
        raise ValueError(
            f"damping_permille must be in (0, 1000), got {damping_permille}"
        )
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # e feeds the node derivation (twice), the weight-mass dim, and
    # the graph join — eager truncation runs the upstream (e.g. the
    # co-occurrence extraction) exactly once
    e = (
        edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .filter(F.col("w") > 0)
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return edges.sparkSession.createDataFrame(
            [], "node long, rank_micro long"
        )
    wsum = e.groupBy("u").agg(F.sum("w").cast("long").alias("w_u"))
    graph = e.join(wsum, "u").localCheckpoint(eager=True)
    dp = damping_permille
    base = ((1000 - dp) * 1000000) // (1000 * n)
    ranks = nodes.withColumn(
        "rank_micro", F.lit(1000000 // n).cast("long")
    )
    for _ in range(iters):
        contrib = (
            graph.join(ranks.withColumnRenamed("node", "u"), "u")
            .select(
                "v",
                F.expr("(rank_micro * w) div w_u").alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").cast("long").alias("incoming"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("v", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({dp} * coalesce(incoming, CAST(0 AS BIGINT)))"
                        " div 1000"
                    )
                ).cast("long").alias("rank_micro"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def neighbor_sample(
    edges: DataFrame,
    fanouts: tuple[int, ...] = (3, 2),
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """(seed, hop, src, dst) — deterministic GraphSAGE-style neighbor
    sampling: for every seed node, hop h keeps at most fanouts[h-1]
    out-neighbors of each frontier node, chosen by ranking candidate
    edges on the portable hash hash60(seed|h|src|dst) — the minibatch
    subgraph sampler a GNN trainer (GraphSAGE/PinSAGE) consumes,
    with NO RNG state: the same graph yields the same sample under any
    partitioning/retry, and the oracle replays it bit-for-bit.

    Scale shape: hop h is one (frontier ⋈ adjacency) equi-join on the
    node key followed by a row_number window PARTITIONED BY (seed,
    src) — per-group state is the fanout cap, and frontier growth is
    bounded by Π fanouts (the sampler's whole point: a hub's million
    neighbors contribute fanout rows, not a million). Frontier is
    eagerly truncated per hop (multi-consumer rule)."""
    from pyspark.sql import Window

    from ..functions.hashing import hash60

    if not fanouts or any(f < 1 for f in fanouts):
        raise ValueError(f"fanouts must be non-empty positive, got {fanouts}")
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).distinct().localCheckpoint(eager=True)
    frontier = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .select(F.col("node").alias("seed"), F.col("node").alias("cur"))
        .localCheckpoint(eager=True)
    )
    out = None
    for h, fan in enumerate(fanouts, start=1):
        key = F.concat_ws(
            "|",
            F.col("seed").cast("string"),
            F.lit(str(h)),
            F.col("cur").cast("string"),
            F.col("v").cast("string"),
        )
        w = Window.partitionBy("seed", "cur").orderBy(
            hash60(key).asc(), F.col("v").asc()
        )
        sampled = (
            frontier.join(e.withColumnRenamed("u", "cur"), "cur")
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= fan)
            .select(
                "seed",
                F.lit(h).cast("long").alias("hop"),
                F.col("cur").alias("src"),
                F.col("v").alias("dst"),
            )
        )
        hop_rows = sampled.localCheckpoint(eager=True)
        out = hop_rows if out is None else out.unionByName(hop_rows)
        frontier = hop_rows.select(
            "seed", F.col("dst").alias("cur")
        ).distinct().localCheckpoint(eager=True)
    return out


def link_prediction_metrics(
    scores: DataFrame, ks: tuple[int, ...] = (1, 3, 10)
) -> DataFrame:
    """One row — (n_seeds, mean_rr_micro, hits{k}_permille...) — the
    standard KG-embedding/link-prediction evaluation: per seed
    (node_a), candidates rank by (aa_micro desc, node_b asc); the
    reciprocal rank of the FIRST true edge (is_edge) gives MRR, and
    hits@k counts seeds whose top-k contains a true edge. Seeds with
    no true edge among their candidates are excluded (reciprocal rank
    undefined there — stated, the conventional filtered protocol).
    Integer-exact: per-seed rr = 1e6 div first_rank, the mean divides
    once on the final row; hits are exact counts → permille.

    Scale shape: one rank window PARTITIONED BY seed (per-group state
    = the candidate list of that seed, already bounded by the capped
    wedge join upstream), one seed-keyed min-aggregate, one global
    fold of small integers."""
    from pyspark.sql import Window

    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must be non-empty positive, got {ks}")
    w = Window.partitionBy("node_a").orderBy(
        F.col("aa_micro").desc(), F.col("node_b").asc()
    )
    ranked = scores.select(
        "node_a", "node_b", "aa_micro", "is_edge"
    ).withColumn("__rank", F.row_number().over(w).cast("long"))
    firsts = (
        ranked.filter(F.col("is_edge"))
        .groupBy("node_a")
        .agg(F.min("__rank").alias("first_rank"))
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_seeds"),
        F.sum(F.expr("1000000 div first_rank")).cast("long").alias("__rr_sum"),
    ]
    for k in ks:
        aggs.append(
            F.sum(F.when(F.col("first_rank") <= k, 1).otherwise(0))
            .cast("long")
            .alias(f"__h{k}")
        )
    folded = firsts.agg(*aggs)
    cols = [
        "n_seeds",
        F.expr("__rr_sum div n_seeds").cast("long").alias("mean_rr_micro"),
    ]
    for k in ks:
        cols.append(
            F.expr(f"(__h{k} * 1000) div n_seeds")
            .cast("long")
            .alias(f"hits{k}_permille")
        )
    return folded.select(*cols)
