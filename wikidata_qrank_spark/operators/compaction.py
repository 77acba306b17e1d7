"""Changelog compaction — latest record per key.

The standard lakehouse/CDC primitive the reference never needs (its
inputs are immutable dumps) but any continuously-ingested deployment
does: given an append-only stream of upserts, produce the current state
= the most recent record per key. One shuffle (the window partition);
ties broken by a caller-named column so the result is deterministic
under the value-hash gate.

At 100 TB this is the compaction pass of an incremental table: the
window is partitioned by the upsert key, so it scales with key
cardinality and never materializes more than one partition's history
per task. Pair with ``repartitionByRange`` + sorted parquet (see
operators/sinks.py) to produce merge-on-read-friendly output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compact_changelog(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Latest row per ``key_cols``: max ``ts_col``, ties broken by max
    ``tiebreak_col`` (must be unique within a (key, ts) group — e.g. a
    monotonically increasing change id)."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def changelog_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD-2 history view: every upsert becomes a validity interval
    [``valid_from``, ``valid_to``) — closed by the key's NEXT change,
    NULL-open for the current version. The dual of
    :func:`compact_changelog` (current state = rows where ``valid_to``
    is NULL); same single shuffle on the upsert key, so the full
    history of one key never leaves one task."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    return df.withColumn(valid_from, F.col(ts_col)).withColumn(
        valid_to, F.lead(ts_col, 1).over(w)
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    deleted_col: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics (Delta/Iceberg write path) as a pure
    transformation: rows of ``updates`` replace matching ``target``
    rows (matched → UPDATE), non-matching update rows are inserted,
    unmatched target rows are kept. If ``deleted_col`` names a boolean
    column on ``updates``, true rows are tombstones: the matching
    target row is dropped and nothing is inserted.

    ``updates`` must be unique per key (pre-compact a changelog with
    :func:`compact_changelog`). One shuffle on the merge key (the
    full-outer join); with both sides bucketed/sorted by key this is
    the merge-on-read compaction a lakehouse table runs.
    """
    keys = list(key_cols)
    value_cols = [c for c in target.columns if c not in keys]
    u_value_cols = [
        c for c in updates.columns if c not in keys and c != deleted_col
    ]
    if value_cols != u_value_cols:
        raise ValueError(
            f"target/updates value columns differ: {value_cols} vs {u_value_cols}"
        )
    t = target.select(*keys, F.struct(*value_cols).alias("__t"))
    u_struct = F.struct(*u_value_cols).alias("__u")
    if deleted_col is None:
        u = updates.select(*keys, u_struct, F.lit(False).alias("__del"))
    else:
        u = updates.select(
            *keys, u_struct, F.coalesce(F.col(deleted_col), F.lit(False)).alias("__del")
        )
    joined = t.join(u, keys, "full_outer").filter(~F.coalesce("__del", F.lit(False)))
    merged = F.coalesce("__u", "__t").alias("__m")
    return joined.select(*keys, merged).select(
        *keys, *[F.col("__m")[c].alias(c) for c in value_cols]
    )
