"""Deterministic negative sampling for KG-embedding training data.

TransE-family training consumes (positive triple, corrupted triple)
pairs where the corrupted object is a random entity that does NOT form a
true triple. At web scale the standard rand() corruption is
irreproducible (partitioning/retry dependent) and the "filtered setting"
(drop corruptions that happen to be true triples) needs an anti-join,
not a driver-side set. This module does both Spark-first:

- the corrupted object is picked by the portable content hash
  (functions/hashing.hash60) of (salt, src, dst, i) modulo the entity
  count, mapped to an entity through a dense 1-based index built with
  the two-phase global_row_number (operators/rank.py:37) — no
  single-partition sort, no driver collect, and the same sample comes
  out after repartitioning, retries, or a re-run on another engine
  (the DuckDB oracle regenerates it bit-for-bit);
- the filtered setting is a left-anti join on (src, corrupted-obj)
  against the true edge set — keyed shuffle, map-side prunable.

The entity count enters as a 1-row broadcast (max index), so the whole
plan stays lazy. Output size is ≤ k·|E| minus filtered collisions;
every shuffle is keyed on an id column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from .rank import global_row_number


def negative_samples(
    edges: DataFrame,
    k: int = 2,
    salt: str = "neg",
    src: str = "src_id",
    dst: str = "dst_id",
    pool: str = "both",
) -> DataFrame:
    """(src_id, dst_id, neg_id, i) — for each distinct true edge, up to
    ``k`` deterministic corrupted objects (i = 0..k-1), excluding
    self-corruptions and true triples (the filtered setting). Fewer
    than k rows survive for edges whose draws collide — by design, so
    both engines agree exactly without rejection-resampling loops.

    ``pool`` picks the corruption candidate set: ``"both"`` (homogeneous
    graph — union of src and dst nodes, self-corruptions dropped) or
    ``"dst"`` (bipartite, e.g. document→entity linking — only true
    objects are drawable, and src/dst may be different types, so no
    self-corruption filter applies)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if pool not in ("both", "dst"):
        raise ValueError(f"pool must be 'both' or 'dst', got {pool!r}")
    # e feeds three branches (node pool, corruption draw, anti-join)
    # and indexed feeds two (count, idx→node map); materialize both or
    # the upstream pipeline re-executes once per branch. Eager
    # localCheckpoint, not persist(): persisted relations stay pinned
    # in the CacheManager until session end (round-5 ADVICE leak).
    e = (
        edges.select(F.col(src).alias("src_id"), F.col(dst).alias("dst_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = e.select(F.col("dst_id").alias("node"))
    if pool == "both":
        nodes = nodes.unionByName(e.select(F.col("src_id").alias("node")))
    nodes = nodes.distinct()
    indexed = global_row_number(
        nodes, [F.col("node").asc()], rank_col="idx"
    ).localCheckpoint(eager=True)
    nn = indexed.agg(F.max("idx").alias("__n"))
    drawn = (
        e.withColumn("i", F.explode(F.array(*[F.lit(j) for j in range(k)])))
        .crossJoin(F.broadcast(nn))
        .withColumn(
            "idx",
            (
                hash60(
                    F.concat(
                        F.lit(f"{salt}:"),
                        F.col("src_id").cast("string"),
                        F.lit(":"),
                        F.col("dst_id").cast("string"),
                        F.lit(":"),
                        F.col("i").cast("string"),
                    )
                )
                % F.col("__n")
                + F.lit(1)
            ).cast("long"),
        )
    )
    neg = drawn.join(indexed.select("idx", F.col("node").alias("neg_id")), "idx")
    if pool == "both":
        neg = neg.filter(F.col("neg_id") != F.col("src_id"))
    filtered = neg.join(
        e.select("src_id", F.col("dst_id").alias("neg_id")),
        ["src_id", "neg_id"],
        "left_anti",
    )
    return filtered.select(
        "src_id", "dst_id", "neg_id", F.col("i").cast("long").alias("i")
    )
