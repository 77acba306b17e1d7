"""Duplicate-cluster materialization: connected components over
candidate-pair edges, then survivor election — the graph-side finish of
the dedup family (pairs → clusters → canonical doc per cluster).

Spark-first shape: iterative min-label propagation. Labels start as the
node id; each round every node takes the min of its own and its
neighbors' labels; converges in O(graph diameter) rounds (duplicate
clusters are shallow — near-clique — so typically 2-3 rounds). Each
round is one join + one groupBy over the EDGE set (|E| ≪ corpus: only
docs that collided in LSH appear), never the corpus. Each round's
label table is ``localCheckpoint``-ed: the previous labels appear
twice in the round's plan (union + neighbor join), so WITHOUT lineage
truncation the logical tree doubles every round and Catalyst compile
time goes exponential in the round count — persist alone caches data
but not the plan. A tiny count() per round detects the fixpoint so
converged graphs stop early.

The DuckDB oracle computes the same components independently via a
recursive-CTE transitive closure — a genuinely different algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ComponentsNotConverged(RuntimeError):
    """Min-label propagation hit max_iters with labels still changing —
    the result would silently split real components, so refuse it.
    Raise max_iters (components converge in O(diameter) rounds; near-dup
    clusters are near-cliques, so hitting this means the edge graph has
    an unexpectedly long path)."""


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """(doc_id, component) for every node appearing in ``pairs``;
    component = min node id of the connected component (deterministic
    canonical label). Raises :class:`ComponentsNotConverged` instead of
    returning partially-propagated labels."""
    edges = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    edges = (
        edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    try:
        changed = 0
        for _ in range(max_iters):
            nbr = edges.join(
                labels.withColumnRenamed("node", "b"), "b"
            ).select(
                F.col("a").alias("node"),
                "label",
                F.lit(None).cast(labels.schema["label"].dataType).alias("__old"),
            )
            # carry the previous label through the min-aggregation
            # (labels are unique per node, so max(__old) recovers it):
            # the fixpoint check becomes a shuffle-free filter-count on
            # the checkpointed rows instead of a join back against the
            # previous round — one fewer join + shuffle per round
            # (guide §2.4), same convergence decision.
            new_labels = (
                labels.select("node", "label", F.col("label").alias("__old"))
                .unionByName(nbr)
                .groupBy("node")
                .agg(
                    F.min("label").alias("label"),
                    F.max("__old").alias("__old"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.filter(F.col("label") != F.col("__old")).count()
            )
            labels = new_labels.select("node", "label")
            if changed == 0:
                break
        if changed != 0:
            raise ComponentsNotConverged(
                f"labels still changing after {max_iters} rounds "
                f"({changed} nodes); raise max_iters"
            )
        return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))
    finally:
        edges.unpersist()


def dup_clusters(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """(doc_id, component, is_survivor): survivor = the component's min
    doc id — the deterministic first-wins election the reference's
    sorted-stream dedup performs (links.go:60-77 semantics, lifted from
    consecutive rows to whole clusters)."""
    cc = connected_components(pairs, a_col, b_col)
    return cc.withColumn("is_survivor", F.col("doc_id") == F.col("component"))


def dup_clusters_scaled(
    documents: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    bands: int | None = None,
    rows_per_band: int | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(doc_id, component) — the 100 TB near-dup clustering pipeline as
    ONE composition:

        minhash banded LSH  →  exact Jaccard verify ON CANDIDATES ONLY
                            →  connected components

    No stage is quadratic in corpus size: LSH shuffles on (band,
    bucket), verification is linear in candidates × doc length (never
    the hot-shingle self-join of ``ngram_jaccard_pairs``), and label
    propagation runs over the verified EDGE set only (|E| ≪ corpus).
    ``hash_family='md5'`` makes the whole composition value-checkable by
    the DuckDB oracle end to end; 'xxhash64' is the faster scale path.
    """
    from .dedup import (
        DEFAULT_BANDS,
        DEFAULT_ROWS_PER_BAND,
        jaccard_verify_candidates,
        minhash_lsh_pairs,
    )

    cand = minhash_lsh_pairs(
        documents,
        text_col,
        shingle_n,
        bands or DEFAULT_BANDS,
        rows_per_band or DEFAULT_ROWS_PER_BAND,
        hash_family,
    )
    verified = jaccard_verify_candidates(
        documents, cand, text_col, shingle_n, threshold
    )
    return connected_components(verified)


def dedup_by_clusters(documents: DataFrame, pairs: DataFrame) -> DataFrame:
    """Corpus minus non-survivor cluster members via left-anti join.

    No broadcast hint: the victim list scales with the duplicate count
    (a 100 TB corpus at a 30% dup rate has billions of victims — far
    past any broadcast limit). AQE picks broadcast vs shuffle from the
    victim table's actual size at runtime."""
    victims = (
        connected_components(pairs)
        .filter(F.col("doc_id") != F.col("component"))
        .select("doc_id")
    )
    return documents.join(victims, "doc_id", "left_anti")


def elect_survivors(
    components: DataFrame,
    scores: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """(component, best_doc_id, best_<score>, cluster_size) — survivor
    election by QUALITY rather than min-id: for each near-dup cluster
    keep the highest-scoring member (ties to the smallest id). This is
    the curation policy real pipelines want — "of these near-dups,
    keep the longest / highest-quality copy" — as opposed to the
    reference's order-dependent first-wins. One window over
    cluster-keyed rows; scores join on the id (KB-wide rows, no
    text). Members missing from ``scores`` are kept via left join and
    rank last (null score), so cluster_size never undercounts and a
    fully unscored cluster still elects a survivor (smallest id)."""
    from pyspark.sql import Window

    j = components.join(scores, id_col, "left")
    w = Window.partitionBy("component").orderBy(
        F.desc_nulls_last(score_col), F.asc(id_col)
    )
    wc = Window.partitionBy("component")
    return (
        j.withColumn("__rk", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(wc).cast("long"))
        .filter(F.col("__rk") == 1)
        .select(
            "component",
            F.col(id_col).alias("best_doc_id"),
            F.col(score_col).alias(f"best_{score_col}"),
            "cluster_size",
        )
    )
