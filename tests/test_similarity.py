from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wikidata_qrank_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
)
from wikidata_qrank_spark.sources.tables import load_table


def test_brute_force_exact_cosine(spark):
    vecs = [
        (0, [1.0, 0.0]),
        (1, [1.0, 1.0]),
        (2, [0.0, 1.0]),
        (3, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    res = brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    by_rank = {r.nn_rank: (r.neighbor_id, r.cosine) for r in res}
    assert by_rank[1][0] == 1
    assert abs(by_rank[1][1] - 1 / math.sqrt(2)) < 1e-6
    assert by_rank[2] == (2, 0.0)


def test_lsh_recall_against_brute_force(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=3).collect()
    }
    # synthetic embeddings are near-uniform random — the hardest case
    # for hyperplane LSH; short codes + many tables keep recall usable
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_bucketed_topk(emb, queries, k=3, nbits=4, num_tables=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"LSH recall too low: {recall}"


def test_ivf_returns_k_per_query(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    res = ivf_topk(emb, queries, k=5, num_centroids=8, nprobe=4)
    counts = {r.query_id: r.n for r in res.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3}
    assert all(v == 5 for v in counts.values())


def test_train_centroids_refines_and_ivf_accepts_them(spark):
    from wikidata_qrank_spark.operators.similarity import (
        ivf_topk,
        seed_centroids,
        train_centroids,
    )

    embeddings = load_table(spark, SF_SMOKE, "embeddings")
    seeds = seed_centroids(embeddings, num_centroids=8)
    assert seeds.count() == 8
    trained = train_centroids(embeddings, num_centroids=8, iters=2)
    # empty cells carry their previous centroid forward, so the codebook
    # never shrinks below the requested size
    assert trained.count() == 8
    # trained centroids differ from the raw seeds (Lloyd moved them)
    joined = trained.join(seeds, "cid").count()
    assert trained.schema["cent"].dataType.simpleString() == "array<double>"
    res = ivf_topk(embeddings, embeddings.limit(4), k=3, centroids=trained)
    per_q = res.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in per_q)
    assert joined >= 0


def test_empty_corpus_is_survivable(spark):
    """Empty day-slices/partitions must not crash the embedding ops —
    empty typed results, not first()[0] TypeErrors."""
    from wikidata_qrank_spark.operators.dedup import embedding_near_dups
    from wikidata_qrank_spark.operators.similarity import (
        lsh_bucketed_topk,
        train_centroids,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert lsh_bucketed_topk(empty, empty, k=3).count() == 0
    assert train_centroids(empty, num_centroids=4, iters=1).count() == 0
    assert embedding_near_dups(empty, threshold=0.5).count() == 0
    assert ivf_topk(empty, empty, k=3).count() == 0


def test_probe_dim_skips_null_vectors(spark):
    """One NULL vector at the head of the corpus must not empty the
    LSH/IVF output (probe_dim skips nulls instead of returning None)."""
    from wikidata_qrank_spark.operators.similarity import probe_dim

    vecs = [(0, None), (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    assert probe_dim(df, "embedding") == 2
    res = lsh_bucketed_topk(
        df.filter(F.col("embedding").isNotNull()),
        df.filter(F.col("vec_id") == 1),
        k=2,
        nbits=2,
        num_tables=4,
    )
    assert res.count() > 0


def test_train_centroids_carries_empty_cells(spark):
    """Duplicate seed centroids tie every assignment to the lowest cid,
    leaving the duplicates' cells empty — the codebook must keep its
    size by carrying the unassigned centroid forward, not shrink."""
    from wikidata_qrank_spark.operators.similarity import train_centroids

    vecs = [(i, [1.0, 0.0]) for i in range(50)] + [
        (100 + i, [0.0, 1.0]) for i in range(50)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    trained = train_centroids(df, num_centroids=4, iters=2)
    assert trained.count() == 4


def test_seed_centroids_sparse_id_space(spark):
    """Rank-based seeding must yield centroids even when ids are sparse
    or offset (an id-modulo rule silently returns zero)."""
    from wikidata_qrank_spark.operators.similarity import ivf_topk, seed_centroids

    vecs = [(1_000_000 + i, [float(i % 7), 1.0]) for i in range(100)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    seeds = seed_centroids(df, num_centroids=8)
    assert seeds.count() == 8
    res = ivf_topk(df, df.limit(2), k=3, num_centroids=8)
    per_q = res.groupBy("query_id").count().collect()
    assert len(per_q) == 2 and all(r["count"] == 3 for r in per_q)


def test_kernel_matches_literal_assign_and_bucket(spark):
    """The broadcast-numpy kernel and the literal Catalyst expression
    must be bit-identical: same fold-ordered dots, same 1e-6 rounding,
    same first-max tiebreak — on the real gate embeddings."""
    from wikidata_qrank_spark.operators.similarity import (
        assign_cells,
        lsh_bucket,
        probe_dim,
        seed_centroids,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = [
        (r["cid"], [float(x) for x in r["cent"]])
        for r in seed_centroids(emb, num_centroids=8).collect()
    ]
    base = emb.select("vec_id", F.col("embedding").alias("__v"))
    lit = {
        r.vec_id: r.cid
        for r in assign_cells(base, "__v", cents, impl="literal").collect()
    }
    ker = {
        r.vec_id: r.cid
        for r in assign_cells(base, "__v", cents, impl="kernel").collect()
    }
    assert lit == ker
    dim = probe_dim(emb, "embedding")
    for seed in (1, 3):
        blit = {
            r.vec_id: r.b
            for r in emb.select(
                "vec_id",
                lsh_bucket(emb, "embedding", 8, seed, dim, impl="literal").alias("b"),
            ).collect()
        }
        bker = {
            r.vec_id: r.b
            for r in emb.select(
                "vec_id",
                lsh_bucket(emb, "embedding", 8, seed, dim, impl="kernel").alias("b"),
            ).collect()
        }
        assert blit == bker


def test_kernel_scales_to_wide_codebooks(spark):
    """dim 256 × k 256 (65 536 constants) — the regime where the literal
    expression tree bloats the Catalyst plan; impl='auto' must route to
    the broadcast kernel and assign every row, and 32-bit LSH bucketing
    at dim 256 must likewise run as a kernel projection."""
    import numpy as np

    from wikidata_qrank_spark.operators.similarity import assign_cells, lsh_bucket

    rng = np.random.default_rng(7)
    n, dim, k = 1000, 256, 256
    vecs = rng.normal(size=(n, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    cents = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(k)]
    out = assign_cells(df, "embedding", cents)  # auto -> kernel
    assert out.count() == n
    assert out.filter(F.col("cid").isNull()).count() == 0
    assert out.select("cid").distinct().count() > 10
    b = df.select(lsh_bucket(df, "embedding", 32, 1, dim).alias("b"))  # auto -> kernel
    assert b.filter(F.col("b").isNotNull()).count() == n


def test_null_vectors_never_poison_training_or_neighbors(spark):
    """A NULL embedding anywhere in the corpus must neither crash
    seeding/training (null landing on a seed rank) nor surface as a
    cosine=NULL pseudo-neighbor in any top-k path."""
    from wikidata_qrank_spark.operators.dedup import embedding_near_dups
    from wikidata_qrank_spark.operators.similarity import (
        brute_force_topk,
        train_centroids,
    )

    vecs = [(0, None), (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]),
            (4, None), (5, [0.5, 0.5])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    trained = train_centroids(df, num_centroids=2, iters=2)
    assert trained.count() == 2  # no TypeError, codebook intact
    for res in (
        brute_force_topk(df, df, k=10),
        lsh_bucketed_topk(df, df, k=10, nbits=2, num_tables=4),
        ivf_topk(df, df, k=10, num_centroids=2, nprobe=2),
        embedding_near_dups(df, threshold=-1.0),
    ):
        rows = res.collect()
        ids = {r[0] for r in rows} | {r[1] for r in rows}
        assert 0 not in ids and 4 not in ids  # null rows never appear
        assert all(r[2] is not None for r in rows)  # no NULL cosines


def test_entity_embeddings_mean_pool_golden(spark):
    """Two entities over three docs with 2-dim vectors: per-dim micro
    sums and means are hand-checked; entity 1 pools docs {0,1},
    entity 2 pools doc {2}; duplicate mentions of the same (doc,
    entity) pair pool once (distinct)."""
    from wikidata_qrank_spark.operators.similarity import entity_embeddings

    mentions = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 1), (2, 2)], "doc_id long, item_id long"
    )
    emb = spark.createDataFrame(
        [(0, [0.5, -1.25]), (1, [1.5, 0.75]), (2, [2.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {(r.item_id, r.dim): r
            for r in entity_embeddings(mentions, emb).collect()}
    assert set(rows) == {(1, 0), (1, 1), (2, 0), (2, 1)}
    assert rows[(1, 0)].n_docs == 2
    assert rows[(1, 0)].sum_micro == 500000 + 1500000
    assert rows[(1, 0)].mean == 1.0
    assert rows[(1, 1)].sum_micro == -1250000 + 750000
    assert rows[(1, 1)].mean == -0.25
    assert rows[(2, 0)].sum_micro == 2000000 and rows[(2, 0)].n_docs == 1


def test_semdedup_drops_lower_id_near_dups(spark):
    """Two exact-duplicate pairs and one unique vector in one small
    corpus: within each duplicate pair the higher id drops, the lower
    id and the unique vector survive, and survivors+dropped partition
    the corpus."""
    from wikidata_qrank_spark.operators.similarity import semdedup

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0]),      # dup of 0 -> dropped
            (2, [0.0, 1.0, 0.0]),
            (3, [0.0, 0.999, 0.01]),   # near-dup of 2 -> dropped
            (4, [-1.0, 0.0, 0.0]),     # cosine -1 vs 0/1 -> kept
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in semdedup(emb, threshold=0.9,
                                          num_centroids=2).collect()}
    assert len(rows) == 5
    assert rows[0].keep is True
    assert rows[1].keep is False
    assert rows[2].keep is True
    assert rows[3].keep is False
    assert rows[4].keep is True


def test_semdedup_cluster_scoping(spark):
    """Near-dup pairs are only compared INSIDE a cell: two identical
    vectors forced into different cells both survive — the documented
    approximation that buys the N²/k bound (recall comes from scaling
    k so true dups land together, which nearest-centroid assignment
    gives identical vectors by construction)."""
    from wikidata_qrank_spark.operators.similarity import semdedup

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [-1.0, 0.05])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in
            semdedup(emb, threshold=0.9, num_centroids=3).collect()}
    # identical vectors assign to the same nearest centroid -> one drops
    assert rows[0].cid == rows[1].cid
    assert rows[0].keep is True and rows[1].keep is False
    assert rows[2].keep is True


def test_ann_recall_monotone_in_nprobe(spark):
    """Recall@k rises with nprobe and reaches 1000 permille when every
    cell is probed (the approximate search degenerates to exact);
    truth size is n_queries x k on this dense fixture."""
    from wikidata_qrank_spark.operators.similarity import ann_recall_report
    from wikidata_qrank_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(emb.vec_id < 8)
    lo = ann_recall_report(emb, q, k=5, num_centroids=8, nprobe=2).collect()[0]
    hi = ann_recall_report(emb, q, k=5, num_centroids=8, nprobe=8).collect()[0]
    assert lo.n_queries == hi.n_queries == 8
    assert lo.n_truth == hi.n_truth == 40
    assert hi.recall_permille == 1000
    assert lo.recall_permille <= hi.recall_permille
