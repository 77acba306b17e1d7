"""Truth discovery / fact fusion over conflicting multi-source claims.

KG construction at web scale ingests the same (subject, object) assertion
from many sources that disagree — the canonical resolution is a
TruthFinder/Latent-Credibility-style loop: vote, score each source by how
often it agrees with the consensus, then re-vote weighted by source
reliability. This module implements one deterministic round of that loop
(majority bootstrap → reliability → weighted re-vote), which is the
production shape: further rounds are the same plan repeated.

The reference pipeline has no fusion stage — its dictionary join takes
the sitelinks table as ground truth (cmd/qrank-builder/build.go) — but a
from-scratch KG built from documents needs one; claims here derive from
the same consecutive-mention adjacency that feeds ``operators/links``
(links.py:24), kept per-document (the document IS the source).

Exactness contract: reliability is integer ppm (``agree·10⁶ div total``
on longs — truncation equals floor for non-negative counts), and the
weighted vote is a SUM OF LONGS, so every aggregate is order-proof; the
DuckDB oracle replays the identical integer recurrence. No double ever
enters an aggregation.

Scale shape: every step is a keyed aggregation or join on (subj, obj),
subj, or source — map-side partials apply throughout; the two winner
picks are per-subject row_number windows (bounded groups); the
reliability dim is source-scale (corpus-sized) and joins on the source
key with NO broadcast hint — AQE broadcasts it at test scale, sort-merge
at web scale. Nothing quadratic, nothing collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def claims(mentions_df: DataFrame) -> DataFrame:
    """(source_id, subj_id, obj_id) — one row per consecutive-mention
    adjacency INSTANCE (same window as links.triples but undeduped and
    source-keyed: each document asserts the edges it contains)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("offset")
    return (
        mentions_df.withColumn("__next", F.lead("item_id").over(w))
        .filter(F.col("__next").isNotNull() & (F.col("__next") != F.col("item_id")))
        .select(
            F.col("doc_id").alias("source_id"),
            F.col("item_id").alias("subj_id"),
            F.col("__next").alias("obj_id"),
        )
    )


def fact_fusion(claims_df: DataFrame) -> DataFrame:
    """(subj_id, obj_id, weight_ppm, n_sources) — the fused object per
    subject after one reliability-weighted round.

    1. bootstrap: majority object per subject (most distinct supporting
       sources, ties toward the smallest object id);
    2. reliability(source) = floor(10⁶ · agreeing-claims / total-claims)
       as an exact long;
    3. re-vote: weight(subj, obj) = Σ reliability over claim instances;
       winner by weight desc, obj asc.

    Sources that only assert bootstrap losers get low reliability, so a
    spam source repeating one wrong fact many times loses to independent
    agreeing sources — the property a plain claim-count vote lacks.
    """
    from pyspark.sql import Window

    w_subj = Window.partitionBy("subj_id")

    # claims enters THREE aggregations (bootstrap vote, agreement
    # flags, weighted re-vote) — without materialization Catalyst
    # re-derives the whole upstream (at gate scale, the
    # corpus→mentions pipeline) once per branch. Eager localCheckpoint
    # instead of persist(): persist registers in the CacheManager and
    # pins the relation until session end (round-5 ADVICE leak),
    # while checkpoint blocks are freed when the frame is GC'd.
    claims_df = claims_df.localCheckpoint(eager=True)

    votes0 = claims_df.groupBy("subj_id", "obj_id").agg(
        F.count_distinct("source_id").cast("long").alias("__ns")
    )
    winner0 = (
        votes0.withColumn(
            "__rn",
            F.row_number().over(
                w_subj.orderBy(F.col("__ns").desc(), F.col("obj_id").asc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("subj_id", F.col("obj_id").alias("__win0"))
    )

    # per-claim agreement flag; winner0 is subject-keyed (≤ one row per
    # subject) — joins on the subject key, no hint (scales with the KB)
    flagged = claims_df.join(winner0, "subj_id").withColumn(
        "__agree", (F.col("obj_id") == F.col("__win0")).cast("long")
    )
    reliability = flagged.groupBy("source_id").agg(
        F.expr("(sum(__agree) * 1000000) div count(*)")
        .cast("long")
        .alias("__r_ppm")
    )

    weighted = (
        claims_df.join(reliability, "source_id")
        .groupBy("subj_id", "obj_id")
        .agg(
            F.sum("__r_ppm").cast("long").alias("weight_ppm"),
            F.count_distinct("source_id").cast("long").alias("n_sources"),
        )
    )
    return (
        weighted.withColumn(
            "__rn",
            F.row_number().over(
                w_subj.orderBy(F.col("weight_ppm").desc(), F.col("obj_id").asc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("subj_id", "obj_id", "weight_ppm", "n_sources")
    )
