"""Incremental knowledge-graph maintenance.

At 10^12 documents the KG is never rebuilt from scratch: a new batch of
documents arrives, the dictionary dimension stays (it is curated, not
derived per-batch), and the view counts / triple set must absorb the
delta without re-reading history. Two compositions realize that:

* :func:`qviews_incremental` — the IVM form of the ranking-signal
  aggregation (reference: qviews accumulation, builder/qviews.go): view
  counts are additive, so merge(agg(base), agg(delta)) == agg(base ∪
  delta). The gate runs the merged form against a DuckDB oracle that
  aggregates the union directly — hash equality IS the invariant.
* :func:`triples_snapshot_diff` — CDC between two corpus snapshots:
  which (subj, pred, obj) edges appear/disappear when the corpus moves
  from snapshot A to snapshot B. Anti-join both ways on the edge key;
  the oracle recomputes both snapshots and diffs with EXCEPT semantics.

Both keep the corpus un-shuffled: mentions are per-document, the only
shuffles are on (item_id) / (subj, pred, obj) — KB-to-GB-scale keys,
never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def qviews_incremental(
    documents: DataFrame, cdict: DataFrame, delta_pred
) -> DataFrame:
    """(item_id, views) computed incrementally: ``delta_pred`` (a
    boolean Column over ``documents``) splits the corpus into history
    and the newly-arrived batch; each side is aggregated independently
    and the partials merged. The dictionary is passed in (the stable
    dimension — per-batch dictionaries would drift from the curated
    one)."""
    from ..operators.mentions import text_mentions
    from ..operators.qrank import qviews
    from ..operators.rollup import merge_aggregate_state
    from ..sources.interleaved import spans

    base = qviews(text_mentions(spans(documents.filter(~delta_pred)), cdict))
    delta = qviews(text_mentions(spans(documents.filter(delta_pred)), cdict))
    return merge_aggregate_state(base, delta, keys=["item_id"])


def triples_snapshot_diff(
    documents: DataFrame, cdict: DataFrame, in_a, in_b
) -> DataFrame:
    """(subj, pred, obj, weight_a, weight_b, change) between two corpus
    snapshots defined by boolean Columns ``in_a`` / ``in_b`` over
    ``documents``. Each snapshot's edge carries its support weight (the
    number of consecutive-mention instances deriving it); the diff
    emits edges whose weight changed — 'added' (absent from A),
    'removed' (absent from B), 'changed' (weight moved). Unchanged
    edges are omitted (the CDC contract: the diff is small even when
    both snapshots are huge; both edge sets aggregate on the same
    (subj, obj) key, so the outer join is co-partitioned)."""
    from ..operators.mentions import text_mentions
    from ..sources.interleaved import spans

    def weighted_edges(pred, wcol: str) -> DataFrame:
        from pyspark.sql import Window

        m = text_mentions(spans(documents.filter(pred)), cdict)
        w = Window.partitionBy("doc_id").orderBy("offset")
        return (
            m.withColumn("__next", F.lead("item_id").over(w))
            .filter(F.col("__next").isNotNull() & (F.col("__next") != F.col("item_id")))
            .groupBy(
                F.concat(F.lit("Q"), F.col("item_id")).alias("subj"),
                F.concat(F.lit("Q"), F.col("__next")).alias("obj"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias(wcol))
            .select("subj", F.lit("links_to").alias("pred"), "obj", wcol)
        )

    a = weighted_edges(in_a, "weight_a")
    b = weighted_edges(in_b, "weight_b")
    key = ["subj", "pred", "obj"]
    return (
        a.join(b, key, "full_outer")
        .filter(
            F.col("weight_a").isNull()
            | F.col("weight_b").isNull()
            | (F.col("weight_a") != F.col("weight_b"))
        )
        .select(
            *key,
            "weight_a",
            "weight_b",
            F.when(F.col("weight_a").isNull(), F.lit("added"))
            .when(F.col("weight_b").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed"))
            .alias("change"),
        )
    )


def kg_qviews_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate composition: delta = documents with doc_id % 10 == 0, the
    oracle aggregates the whole corpus directly."""
    from ..operators.linking import canonical_dictionary
    from ..sources.interleaved import dictionary, redirects
    from ..sources.tables import load_table

    documents = load_table(spark, sf_dir, "documents")
    d = dictionary(documents)
    # localCheckpoint: the dictionary subtree feeds TWO mention joins
    # (base + delta) — without truncation Catalyst replicates the
    # corpus scan + rank window + redirect joins per broadcast use
    # (pipeline.py's rationale). localCheckpoint over persist: its
    # blocks are freed by the ContextCleaner when the plan goes out of
    # scope, so gate runs don't accumulate pinned cache entries.
    cdict = canonical_dictionary(d, redirects(d)).localCheckpoint(eager=True)
    return qviews_incremental(
        documents, cdict, F.col("doc_id") % 10 == 0
    )


def kg_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate composition: snapshot A drops doc_id % 5 == 0, snapshot B
    drops doc_id % 5 == 1 — overlapping but distinct corpora, so both
    'added' and 'removed' rows occur. The dictionary derives from the
    FULL corpus in both (the stable-dimension contract)."""
    from ..operators.linking import canonical_dictionary
    from ..sources.interleaved import dictionary, redirects
    from ..sources.tables import load_table

    documents = load_table(spark, sf_dir, "documents")
    d = dictionary(documents)
    # same two-consumer rationale as kg_qviews_incremental
    cdict = canonical_dictionary(d, redirects(d)).localCheckpoint(eager=True)
    return triples_snapshot_diff(
        documents,
        cdict,
        F.col("doc_id") % 5 != 0,
        F.col("doc_id") % 5 != 1,
    )


def degrees_incremental(
    documents: DataFrame, cdict: DataFrame, delta_pred
) -> DataFrame:
    """(node, out_degree, in_degree) maintained incrementally: history
    and the new batch each derive a per-batch WEIGHTED edge table
    (edge key → support count; documents are atomic, so
    consecutive-mention edges never straddle a batch), the supports
    merge with one full-outer sum on the edge key, and degrees count
    the surviving DISTINCT edges. Distinct is not directly mergeable —
    the support multiset is the auxiliary state that makes it IVM-able
    (a key is present iff its merged support ≥ 1; deletions would
    subtract supports against the same state).

    Cost shape: history text is never re-read once its support table
    stands — the merge is O(|Δ| + |edge keys|) on KB-scale keys, and
    the degree fold is the usual node-keyed aggregation. Gate proof:
    hash equality against the full-recompute oracle (the
    kg_qviews_incremental pattern applied to the graph's adjacency
    state)."""
    from pyspark.sql import Window

    from ..operators.mentions import text_mentions
    from ..sources.interleaved import spans

    def support(pred) -> DataFrame:
        m = text_mentions(spans(documents.filter(pred)), cdict)
        w = Window.partitionBy("doc_id").orderBy("offset")
        return (
            m.withColumn("__next", F.lead("item_id").over(w))
            .filter(
                F.col("__next").isNotNull()
                & (F.col("__next") != F.col("item_id"))
            )
            .groupBy(
                F.col("item_id").alias("src_id"),
                F.col("__next").alias("dst_id"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
        )

    base = support(~delta_pred)
    delta = support(delta_pred)
    merged = (
        base.join(delta, ["src_id", "dst_id"], "full_outer")
        .select(
            "src_id",
            "dst_id",
            (
                F.coalesce(base["support"], F.lit(0))
                + F.coalesce(delta["support"], F.lit(0))
            ).alias("support"),
        )
        .filter(F.col("support") >= 1)
    )
    from ..operators.graph import degrees

    return degrees(merged.select("src_id", "dst_id"))


def kg_degrees_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate composition: delta = documents with doc_id % 10 == 0; the
    oracle recomputes degrees over the whole corpus directly — hash
    equality proves merge(agg(base), agg(delta)) == agg(base ∪ delta)
    on the graph adjacency state."""
    from ..operators.linking import canonical_dictionary
    from ..sources.interleaved import dictionary, redirects
    from ..sources.tables import load_table

    documents = load_table(spark, sf_dir, "documents")
    d = dictionary(documents)
    # two-consumer dictionary truncation, as in kg_qviews_incremental
    cdict = canonical_dictionary(d, redirects(d)).localCheckpoint(eager=True)
    return degrees_incremental(documents, cdict, F.col("doc_id") % 10 == 0)


def rank_drift(
    documents: DataFrame, cdict: DataFrame, in_a, in_b
) -> DataFrame:
    """(item_id, views_a, views_b, rank_a, rank_b, rank_drift) —
    ranking drift between two corpus snapshots: each snapshot's
    per-entity view counts rank independently (views desc, item asc —
    the qrank order), the full outer join keeps items that appear in
    only one snapshot (NULL views/rank there, NULL drift), and
    rank_drift = rank_a − rank_b (positive: the item ROSE into
    snapshot B). The between-dumps product question the reference's
    published qrank CSVs get diffed for by hand.

    Ranks come from rank.global_row_number (two-phase, no
    single-partition sort); each snapshot aggregates independently
    (map-side partials) and the final join keys on item_id."""
    from ..operators.mentions import text_mentions
    from ..operators.qrank import qviews
    from ..operators.rank import global_row_number
    from ..sources.interleaved import spans

    def ranked(pred, vcol: str, rcol: str) -> DataFrame:
        qv = qviews(text_mentions(spans(documents.filter(pred)), cdict))
        return global_row_number(
            qv,
            [F.col("views").desc(), F.col("item_id").asc()],
            rank_col=rcol,
        ).select("item_id", F.col("views").alias(vcol), rcol)

    a = ranked(in_a, "views_a", "rank_a")
    b = ranked(in_b, "views_b", "rank_b")
    return a.join(b, "item_id", "full_outer").select(
        "item_id",
        "views_a",
        "views_b",
        "rank_a",
        "rank_b",
        (F.col("rank_a") - F.col("rank_b")).cast("long").alias("rank_drift"),
    )


def kg_rank_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate composition: snapshot A drops doc_id % 5 == 0, snapshot B
    drops doc_id % 5 == 1 (the kg_snapshot_diff split)."""
    from ..operators.linking import canonical_dictionary
    from ..sources.interleaved import dictionary, redirects
    from ..sources.tables import load_table

    documents = load_table(spark, sf_dir, "documents")
    d = dictionary(documents)
    cdict = canonical_dictionary(d, redirects(d)).localCheckpoint(eager=True)
    return rank_drift(
        documents,
        cdict,
        F.col("doc_id") % 5 != 0,
        F.col("doc_id") % 5 != 1,
    )
