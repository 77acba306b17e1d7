"""QRank core: per-entity view aggregation + rank ordering.

* ``qviews`` — A4 semantics (qviews.go:109-121): sum of view counts per
  entity after the mention join. Implemented as a **salted two-phase
  aggregation**: hot entities (Q5-the-human class; here literally the
  token 'the') would otherwise hammer one reducer. Sum is associative so
  salting is result-transparent.
* ``qrank`` — O3 semantics (qrank.go:45-53, golden qrank_test.go:23-28):
  order by rank descending, entity id ascending tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rank import global_row_number

DEFAULT_SALT = 16


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    out_col: str,
    salt_buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase skew-proof sum: groupBy(key, salt).sum → groupBy(key).sum.

    Phase 1 spreads each hot key over ``salt_buckets`` reducers; phase 2
    combines ``salt_buckets`` partial rows per key — negligible. Catalyst
    already does map-side partial aggregation; salting additionally caps
    the *reduce-side* row count per task for any single key.
    """
    # deterministic per-row salt: hash the whole row so retries/replays
    # land each row in the same bucket (monotonically_increasing_id or
    # rand() would break exactly-once-per-row on task retry)
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(F.sum(value_col).alias("__partial"))
    return partial.groupBy(*key_cols).agg(F.sum("__partial").cast("long").alias(out_col))


def qviews(mentions_df: DataFrame, weight_col: str | None = None) -> DataFrame:
    """(item_id, views): per-entity mention/view count. Each mention
    counts 1 unless ``weight_col`` supplies a count column (the weekly
    pageview files carry pre-aggregated counts; raw mentions carry 1)."""
    weighted = (
        mentions_df.withColumn("__w", F.lit(1).cast("long"))
        if weight_col is None
        else mentions_df.withColumn("__w", F.col(weight_col).cast("long"))
    )
    return salted_sum(weighted, ["item_id"], "__w", "views")


def qrank(qviews_df: DataFrame) -> DataFrame:
    """(item, views, rank) ordered desc views, asc item_id — two-phase
    global rank, no single-partition sort."""
    ordered_cols = [F.col("views").desc(), F.col("item_id").asc()]
    ranked = global_row_number(qviews_df, ordered_cols, rank_col="rank")
    return ranked.select(
        F.concat(F.lit("Q"), F.col("item_id")).alias("item"),
        "item_id",
        "views",
        "rank",
    )
