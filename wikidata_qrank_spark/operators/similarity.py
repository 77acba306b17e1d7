"""Similarity search over embedding columns (array<float>).

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus; dot products via ``F.zip_with`` +
  ``F.aggregate`` entirely JVM-side (cast to double for stable
  accumulation). The 100 TB baseline: one map-only pass over the
  corpus + a per-query top-k aggregation.
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH signs
  bucket the corpus; candidates = same-bucket rows only, then exact
  re-rank inside buckets. Multiple hash tables raise recall.
* ``ivf_topk`` — IVF: deterministic seed centroids (oracle-checkable)
  or a ``train_centroids`` Lloyd-refined codebook; probe the ``nprobe``
  nearest cells only. Training assigns cells MAP-ONLY — one shuffle per
  Lloyd iteration, the clusters×1-row mean aggregation.

Cell assignment and LSH bucketing each have two bit-identical physical
forms behind ``impl='auto'``: a literal Catalyst expression (whole-stage
codegen, zero Python — right while k×dim / nbits×dim literals stay
small) and a broadcast-numpy Arrow kernel (right at real embedding
scale, where a dim-768 × k-65536 literal tree would bloat the plan past
codegen limits). Same constants, same fold-ordered dots, same 1e-6
rounding and tiebreaks — so the DuckDB oracles hold for either form.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.precision import round6


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_cosine(df: DataFrame, a_col: str, b_col: str, out: str = "cosine") -> DataFrame:
    a, b = F.col(a_col), F.col(b_col)
    return df.withColumn(out, round6(_dot(a, b) / (_norm(a) * _norm(b))))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, nn_rank) — exact top-k per query,
    excluding self-matches and NULL vectors (a null embedding would
    otherwise surface as a cosine=NULL 'neighbor' whenever a query has
    fewer than k real candidates). Queries are broadcast (small)."""
    # norms are precomputed once per side (q: per query row, c: per
    # corpus row) instead of inside the pair expression, where each of
    # the |corpus|×|queries| scored rows would re-fold both vectors —
    # 3 interpreted array folds per pair down to 1 (guide §1.2). The
    # product keeps the original (norm_q * norm_c) operand order, so
    # every double — and round6 of it — is bit-identical.
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        .filter(F.col("q_vec").isNotNull())
        .withColumn("__qn", _norm(F.col("q_vec")))
    )
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
        .filter(F.col("c_vec").isNotNull())
        .withColumn("__cn", _norm(F.col("c_vec")))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            round6(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("__qn") * F.col("__cn"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "nn_rank")
    )


def probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """Embedding dimensionality from the first NON-NULL vector; None for
    a corpus with no vectors at all (callers return an empty,
    correctly-typed result instead of crashing on ``first()[0]`` — a
    100 TB pipeline hits empty partitions and empty day-slices as a
    matter of course). Null rows are skipped, not fatal: one NULL vector
    at the head of the corpus must not empty the whole LSH/IVF output."""
    row = df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
    if row is None:
        return None
    return len(row[0])


def _empty_topk(spark) -> DataFrame:
    return spark.createDataFrame(
        [], "query_id long, neighbor_id long, cosine double, nn_rank int"
    )


# Literal expression trees embed k×dim (or nbits×dim) float constants in
# the Catalyst plan — the right zero-shuffle trick at gate scale, but at
# real embedding scale (dim 768, k 4096–65536, 8 tables) the PLAN itself
# becomes the bottleneck: multi-MB expression trees, codegen limits.
# Above this constant-count threshold the same math runs as a
# broadcast-numpy Arrow kernel instead (same rounded values, same
# tiebreaks — the oracle constants are unchanged).
LITERAL_EXPR_LIMIT = 4096


def _fold_dots(vecs, mats):
    """(n×dim float64) · (k×dim float64)ᵀ → n×k dot products with STRICT
    left-fold accumulation over the dim axis — bit-for-bit the fold
    ``F.aggregate(zip_with(...), 0.0, acc+v)`` computes. BLAS matmul
    reorders the sum (pairwise/SIMD), which can flip the 1e-6 rounding
    on knife-edge values and break cross-impl/oracle parity. Vectorized
    across rows×cells; dim sequential iterations."""
    acc = np.zeros((vecs.shape[0], mats.shape[0]), dtype=np.float64)
    for j in range(vecs.shape[1]):
        acc += vecs[:, j : j + 1] * mats[:, j]
    return acc


def _round6_np(x):
    return np.floor(x * 1000000.0 + 0.5) / 1000000.0


def _stack_f64(values) -> "object":
    return np.stack([np.asarray(v, dtype=np.float64) for v in values])


def _lsh_bucket_kernel(df: DataFrame, vec_col: str, nbits: int, table_seed: int, dim: int):
    """Broadcast-numpy form of the literal ``lsh_bucket`` expression:
    the nbits×dim hyperplane matrix ships once per executor via a Spark
    broadcast instead of nbits×dim literals in the plan; the Arrow
    kernel computes the identical fold-ordered dots, so bucket ids are
    bit-equal to the literal form. NULL vectors get bucket 0, exactly
    like the literal expression (``F.when(null > 0, ...)`` falls through
    to otherwise(0))."""
    planes = np.array(
        [_hyperplane(dim, table_seed * 97 + bit + 1) for bit in range(nbits)],
        dtype=np.float64,
    )
    weights = 1 << np.arange(nbits, dtype=np.int64)
    b_planes = df.sparkSession.sparkContext.broadcast(planes)

    @F.pandas_udf("long")
    def bucket(vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(vecs), dtype=np.int64)
        mask = vecs.notna().to_numpy()
        if mask.any():
            arr = _stack_f64(vecs[mask])
            signs = _fold_dots(arr, b_planes.value) > 0
            out[mask] = signs @ weights
        return pd.Series(out)

    return bucket(F.col(vec_col))


def make_assign_cells_udf(spark, cent_rows: list[tuple[int, list[float]]]):
    """Broadcast-numpy form of ``_assign_cell``: the k×dim codebook
    ships as a Spark broadcast; per Arrow batch, fold-ordered dots →
    round6 → first-max argmax over cid-ascending columns (np.argmax
    returns the FIRST max — the same lowest-cid tiebreak as
    array_position-of-array_max). NULL vectors → NULL cid, like the
    literal expression."""
    ordered = sorted(cent_rows, key=lambda r: r[0])
    cids = np.array([int(c) for c, _ in ordered], dtype=np.int64)
    mat = np.array([list(v) for _, v in ordered], dtype=np.float64)
    b_cids = spark.sparkContext.broadcast(cids)
    b_mat = spark.sparkContext.broadcast(mat)

    @F.pandas_udf("long")
    def assign(vecs: pd.Series) -> pd.Series:
        out = np.empty(len(vecs), dtype=object)
        out[:] = None
        mask = vecs.notna().to_numpy()
        if mask.any():
            arr = _stack_f64(vecs[mask])
            sims = _round6_np(_fold_dots(arr, b_mat.value))
            out[mask] = b_cids.value[np.argmax(sims, axis=1)]
        return pd.Series(out)

    return assign


def assign_cells(
    df: DataFrame,
    vec_col: str,
    cent_rows: list[tuple[int, list[float]]],
    out: str = "cid",
    impl: str = "auto",
) -> DataFrame:
    """Map-only nearest-cell assignment. ``impl='auto'`` picks the
    literal expression for small codebooks (plan stays whole-stage
    codegen'd, zero Python) and the broadcast-numpy kernel when
    k×dim literals would bloat the Catalyst plan; both produce
    identical cids (same rounding, same tiebreak)."""
    k = len(cent_rows)
    dim = len(cent_rows[0][1]) if cent_rows else 0
    if impl == "auto":
        impl = "literal" if k * dim <= LITERAL_EXPR_LIMIT else "kernel"
    if impl == "kernel":
        udf = make_assign_cells_udf(df.sparkSession, cent_rows)
        return df.withColumn(out, udf(F.col(vec_col)))
    if impl != "literal":
        raise ValueError(f"unknown impl: {impl!r}")
    return df.withColumn(out, _assign_cell(F.col(vec_col), cent_rows))


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (pure Python, tiny)."""
    vals = []
    state = seed * 2654435761 % (2**32)
    for _ in range(dim):
        state = (1103515245 * state + 12345) % (2**31)
        vals.append((state / 2**31) * 2.0 - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_bucket(
    df: DataFrame,
    vec_col: str,
    nbits: int,
    table_seed: int,
    dim: int | None = None,
    impl: str = "auto",
):
    """Signed random-projection bucket id (0..2^nbits-1) as a column.
    Pass ``dim`` to avoid a driver action per call (callers looping over
    hash tables should probe the dimension once). ``impl='auto'`` keeps
    the literal hyperplane expression while nbits×dim stays small and
    switches to the broadcast-numpy kernel past LITERAL_EXPR_LIMIT —
    identical buckets either way (same hyperplane constants, same
    fold-ordered dots)."""
    if dim is None:
        dim = probe_dim(df, vec_col)
        if dim is None:
            raise ValueError("empty corpus: cannot probe LSH dimension")
    if impl == "auto":
        impl = "literal" if nbits * dim <= LITERAL_EXPR_LIMIT else "kernel"
    if impl == "kernel":
        return _lsh_bucket_kernel(df, vec_col, nbits, table_seed, dim)
    if impl != "literal":
        raise ValueError(f"unknown impl: {impl!r}")
    expr = F.lit(0).cast("long")
    for bit in range(nbits):
        plane = F.array(
            *[F.lit(v) for v in _hyperplane(dim, table_seed * 97 + bit + 1)]
        )
        sign = _dot(F.col(vec_col), plane) > 0
        expr = expr + F.when(sign, F.lit(1 << bit)).otherwise(F.lit(0)).cast("long")
    return expr


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 8,
    num_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: union of per-table same-bucket candidates,
    exact cosine re-rank. Shuffle key = (table, bucket) — corpus text
    never fans out beyond its buckets. NULL vectors are excluded (they
    would hash to bucket 0 and emit cosine=NULL pseudo-neighbors)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).filter(F.col("c_vec").isNotNull())
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).filter(F.col("q_vec").isNotNull())
    dim = probe_dim(c, "c_vec")
    if dim is None:
        return _empty_topk(corpus.sparkSession)
    cand = None
    for t in range(num_tables):
        cb = c.withColumn("bucket", lsh_bucket(c, "c_vec", nbits, t + 1, dim))
        qb = q.withColumn("bucket", lsh_bucket(q, "q_vec", nbits, t + 1, dim))
        pairs = cb.join(F.broadcast(qb), "bucket").drop("bucket")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.filter(F.col("neighbor_id") != F.col("query_id")).dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    scored = cand.withColumn(
        "cosine",
        round6(
            _dot(F.col("q_vec"), F.col("c_vec"))
            / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "nn_rank")
    )


def seed_centroids(
    corpus: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seed centroids: every step-th row by id RANK
    (two-phase global_row_number — no single-task sort), step =
    max(1, n // num_centroids), ranks 1, 1+step, …, 1+(k-1)·step.

    Rank-based (not id-value-based) so sparse or offset id spaces —
    ids 1_000_000… — still yield num_centroids seeds; an id-modulo
    rule silently returns zero centroids there. NULL vectors are
    excluded up front: a null row landing on a seed rank would poison
    the codebook (train_centroids iterates its elements)."""
    from .rank import global_row_number

    vecs = corpus.filter(F.col(vec_col).isNotNull())
    n = vecs.count()
    step = max(1, n // num_centroids)
    ranked = global_row_number(
        vecs.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cent")),
        [F.col("cid").asc()],
        rank_col="__rn",
    )
    return (
        ranked.filter(
            ((F.col("__rn") - 1) % step == 0)
            & (F.col("__rn") <= 1 + (num_centroids - 1) * step)
        ).drop("__rn")
    )


def _assign_cell(vec_col, cent_rows: list[tuple[int, list[float]]]):
    """Map-only nearest-cell expression: rounded dot against each
    centroid (literal arrays), argmax with lowest-cid tiebreak via
    array_position-of-array_max over the cid-ascending sim array. The
    semantic twin of `ORDER BY sim DESC, cid ASC … r=1` — but zero
    shuffle: at corpus scale this replaces a corpus×k exchange through a
    row_number window with a pure projection."""
    ordered = sorted(cent_rows, key=lambda r: r[0])
    sims = F.array(
        *[
            round6(_dot(vec_col, F.array(*[F.lit(float(x)) for x in vec])))
            for _, vec in ordered
        ]
    )
    cids = F.array(*[F.lit(int(cid)) for cid, _ in ordered])
    idx = F.array_position(sims, F.array_max(sims)).cast("int")
    return F.element_at(cids, idx).cast("long")


def train_centroids(
    corpus: DataFrame,
    num_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "auto",
) -> DataFrame:
    """Lloyd refinement of the seed centroids (the k-means step the
    round-1 IVF left as a placeholder). Per iteration: map-only
    nearest-cell assignment (``_assign_cell``, centroids inlined as
    literal arrays — same max-dot rule ivf_topk probes with), then the
    per-cluster elementwise mean via ``dim`` avg-aggregate columns in
    ONE groupBy — clusters×1 shuffle rows, the same shape as the
    minhash fix; no posexplode of vectors and no corpus×k exchange.
    Each Lloyd iteration is ONE shuffle total. round6 on centroid dims
    removes float summation-order jitter; the (tiny, ≤num_centroids-row)
    codebook is collected per iteration, which also keeps the loop's
    lineage flat."""
    spark = corpus.sparkSession
    dim = probe_dim(corpus, vec_col)
    if dim is None:
        return spark.createDataFrame([], "cid long, cent array<double>")
    cent_rows = [
        (r["cid"], [float(x) for x in r["cent"]])
        for r in seed_centroids(corpus, num_centroids, id_col, vec_col).collect()
    ]
    c = corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    for _ in range(iters):
        assigned = assign_cells(c, "__v", cent_rows, out="cid", impl=impl)
        means = assigned.groupBy("cid").agg(
            *[round6(F.avg(F.col("__v")[i])).alias(f"__m{i}") for i in range(dim)]
        )
        new = {
            r["cid"]: [float(r[f"__m{i}"]) for i in range(dim)]
            for r in means.collect()
        }
        # a cid with no assignments produces no mean row; carry its
        # previous centroid forward instead of silently shrinking the
        # codebook (ivf_topk would then probe fewer cells than asked)
        cent_rows = [(cid, new.get(cid, vec)) for cid, vec in cent_rows]
    return spark.createDataFrame(cent_rows, "cid long, cent array<double>")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    nprobe: int = 4,
    centroids: DataFrame | None = None,
    impl: str = "auto",
) -> DataFrame:
    """IVF-style ANN: centroids = deterministic corpus sample (every
    Nth vector by id order — a kmeans iteration would refine them; the
    partition-probe structure is what matters for the scale path).
    Corpus shuffles once on centroid id; queries probe nprobe cells.

    Centroid choice is fully deterministic: ids divisible by step AND
    below step×num_centroids (a bare ``limit`` after the filter would
    pick an arbitrary subset when the filter matches num_centroids+1
    ids). Assignment similarity is rounded to 1e-6 with centroid-id
    tiebreak so the cell assignment is reproducible bit-for-bit across
    engines (the DuckDB oracle mirrors it). Pass ``centroids`` (e.g.
    from ``train_centroids``) to probe a trained codebook instead of
    the deterministic seeds. NULL vectors are excluded on both sides
    (a null corpus row gets a null cid anyway; a null query would rank
    cells by NULL sims)."""
    if centroids is None:
        centroids = seed_centroids(corpus, num_centroids, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).filter(F.col("c_vec").isNotNull())
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).filter(F.col("q_vec").isNotNull())

    # corpus → nearest cell: MAP-ONLY via the literal-argmax projection
    # (_assign_cell is the semantic twin of r=1 over sim DESC, cid ASC —
    # same rounded sims, same tiebreak — so the oracle is unchanged).
    # The codebook is ≤num_centroids rows; collecting it is bounded.
    cent_rows = [
        (r["cid"], [float(x) for x in r["cent"]]) for r in centroids.collect()
    ]
    if not cent_rows:  # empty corpus → no cells → no neighbors
        return _empty_topk(corpus.sparkSession)
    cassign = assign_cells(c, "c_vec", cent_rows, out="cid", impl=impl).select(
        "neighbor_id", "c_vec", "cid"
    )
    # the codebook is already on the driver — rebuild the broadcast side
    # from it instead of re-evaluating the centroids plan (which would
    # rescan the corpus a second time)
    cent_df = corpus.sparkSession.createDataFrame(
        cent_rows, "cid long, cent array<double>"
    )
    qassign = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("sim", round6(_dot(F.col("q_vec"), F.col("cent"))))
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("cid")
                )
            ),
        )
        .filter(F.col("r") <= nprobe)
        .select("query_id", "q_vec", "cid")
    )
    cand = cassign.join(qassign, "cid").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "cosine",
        round6(
            _dot(F.col("q_vec"), F.col("c_vec"))
            / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "nn_rank")
    )


def entity_embeddings(
    mentions_df: DataFrame, embeddings_df: DataFrame
) -> DataFrame:
    """Mean-pooled entity embeddings from the corpus: every entity's
    vector is the per-dimension average over the embeddings of the
    distinct documents that mention it — rows (item_id, dim, n_docs,
    sum_micro, mean), the standard bag-of-contexts entity
    representation a KG-embedding bootstrap or semantic entity-dedup
    consumes.

    Exact-integer discipline: each float component is widened to
    double and snapped to BIGINT micro units BEFORE the per-(entity,
    dim) sum, so the fold is order-free (a raw float sum over millions
    of mentions would depend on aggregation order and break
    cross-engine parity); the mean divides once per output row.

    Scale shape: one distinct on (doc, entity), one doc-keyed join to
    the vector table, then posexplode to (entity, dim) keyed partial
    aggregation — shuffle rows = mentions×dim but each is 3 small
    columns, and the map-side combine collapses per-partition
    duplicates. Output is entity×dim rows (a KB-scale dim table), NOT
    a collected matrix — downstream cosine/LSH reads it distributed."""
    m = mentions_df.select("doc_id", "item_id").distinct()
    e = embeddings_df.select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    ex = m.join(e, "doc_id").select(
        "item_id", F.posexplode("embedding").alias("dim", "val")
    )
    micro = F.floor(F.col("val").cast("double") * 1000000.0 + 0.5).cast(
        "long"
    )
    per = ex.groupBy("item_id", F.col("dim").cast("long").alias("dim")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(micro).alias("sum_micro"),
    )
    mean = (
        F.col("sum_micro").cast("double") / 1000000.0
    ) / F.col("n_docs").cast("double")
    from ..functions.precision import round6

    return per.select(
        "item_id", "dim", "n_docs", "sum_micro", round6(mean).alias("mean")
    )


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.2,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "auto",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by
    clustering embeddings, then dropping any vector with a
    more-canonical (lower-id) near-duplicate IN ITS OWN CLUSTER at
    cosine ≥ threshold — rows (vec_id, cid, keep). The training-data
    curation step between exact/MinHash dedup (surface overlap) and
    nothing: it removes paraphrases and re-renders that share no
    n-grams.

    Why the cluster-then-compare shape survives 100 TB: all-pairs
    cosine over N docs is N², but pairs are only formed WITHIN a cell
    (self-join keyed on cid — one shuffle, hash-partitioned), so the
    quadratic term is Σ|cell|² ≈ N²/k, driven down by scaling the
    codebook with the corpus (k ∝ N/cell_budget; the paper uses
    ~50k clusters at web scale). Assignment is the map-only
    ``assign_cells`` (literal codegen or broadcast-numpy — no corpus×k
    shuffle); the drop rule is a per-pair filter + anti-join, no
    connected components needed because "keep the lowest id" is
    order-free and transitive-closure-free by construction.

    Deterministic twin of the DuckDB oracle: seed centroids (every
    step-th row by id rank), rounded-dot argmax with lowest-cid
    tiebreak, round6 cosine — the identical rule chain td_ivf_ann
    pins."""
    vecs = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v")
    ).filter(F.col("__v").isNotNull())
    cent_rows = [
        (r["cid"], [float(x) for x in r["cent"]])
        for r in seed_centroids(corpus, num_centroids, id_col, vec_col).collect()
    ]
    # assigned feeds THREE consumers (both pair sides and the final
    # keep join) — eager truncation runs the corpus scan + assignment
    # once instead of letting the branches race-recompute it; the
    # materialized width is (id, vector, cid), which the pair join
    # needs resident anyway
    assigned = assign_cells(vecs, "__v", cent_rows, out="cid", impl=impl).localCheckpoint(
        eager=True
    )
    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("__v").alias("__va"), "cid"
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), F.col("__v").alias("__vb"), "cid"
    )
    scored = with_cosine(
        a.join(b, "cid").filter(F.col("id_a") < F.col("id_b")),
        "__va",
        "__vb",
    )
    dropped = (
        scored.filter(F.col("cosine") >= F.lit(threshold))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__drop", F.lit(True))
    )
    return (
        assigned.join(dropped, "vec_id", "left")
        .select(
            "vec_id", "cid", F.col("__drop").isNull().alias("keep")
        )
    )


def ann_recall_report(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """One row — (n_queries, n_truth, n_hit, recall_permille): measured
    recall@k of the IVF approximate search against the exact
    brute-force top-k on the same queries — the acceptance dial for
    (num_centroids, nprobe): the IVF plan only probes nprobe cells, so
    true neighbors in unprobed cells are the recall loss this report
    makes visible (the ANN twin of dedup.lsh_quality_report).

    Both sides run their documented plans; truth and candidates are
    eagerly truncated (each feeds a count AND the intersection), the
    hit join keys on (query, neighbor), ratios are exact integer
    permille."""
    truth = brute_force_topk(
        corpus, queries, k, id_col, vec_col
    ).select("query_id", "neighbor_id").localCheckpoint(eager=True)
    approx = ivf_topk(
        corpus, queries, k, id_col, vec_col,
        num_centroids=num_centroids, nprobe=nprobe,
    ).select("query_id", "neighbor_id").localCheckpoint(eager=True)
    nq = queries.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    nh = approx.join(truth, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    return (
        nq.crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nh))
        .select(
            "n_queries",
            "n_truth",
            "n_hit",
            F.expr(
                "CASE WHEN n_truth > 0 THEN"
                " CAST((n_hit * 1000) div n_truth AS BIGINT) END"
            ).alias("recall_permille"),
        )
    )
