"""As-of (nearest-timestamp) join — an operator Spark's built-ins lack
(SPARK-22947 never merged) and a staple of event/feature pipelines:
for every left row, the single right row with the greatest
``ts ≤ left.ts`` (backward; inclusive) per key — e.g. "the user's most
recent click at purchase time".

Spark-first shape — NOT a range join: the naive
``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + row_number explodes to
O(|matches|²) per key. Instead both sides union into ONE stream sorted
by (key, ts, side); a single running-``last`` window carries the most
recent right row forward onto each left row. One shuffle (the window
partition by key), zero fan-out, O(n log n) within partitions — the
sort-merge formulation every dedicated engine uses.

The matched right row travels as ONE struct column through the window
(not per-column ``last``: a right column that is legitimately NULL
would otherwise fall back to an OLDER right row's value, stitching
fields from different rows).

The DuckDB oracle is the genuinely independent check: its native
``ASOF LEFT JOIN`` operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row plus the matched ``right``
    row's ``right_cols`` (renamed ``<col><suffix>``; NULL when no match
    exists yet).

    * ``direction='backward'`` (default): greatest right ``ts_col`` ≤
      left's (inclusive). ``'forward'``: smallest right ``ts_col`` ≥.
    * Ties: at equal timestamps the right row IS visible to the left
      row; among duplicate right rows at one (key, ts) the one with the
      greatest ``tiebreak_col`` wins (deterministic — pass e.g. an
      event id; required when the right side can carry duplicates).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    rcols = right_cols or [c for c in right.columns if c not in (on, ts_col)]
    rtypes = dict(right.dtypes)
    struct_t = "struct<" + ", ".join(f"{c}: {rtypes[c]}" for c in rcols) + ">"

    # side tag orders right rows so the window sees them at equal ts:
    # backward → right sorts BEFORE left; forward → right sorts AFTER
    l_tag, r_tag = (1, 0) if direction == "backward" else (0, 1)
    l = left.select(
        "*",
        F.lit(l_tag).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(struct_t).alias("__r"),
    )
    tb = F.col(tiebreak_col).cast("long") if tiebreak_col else F.lit(0).cast("long")
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(r_tag).alias("__side"),
        tb.alias("__tb"),
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
    )
    ltypes = dict(left.dtypes)
    for c in left.columns:
        if c not in (on, ts_col):
            r = r.withColumn(c, F.lit(None).cast(ltypes[c]))
    unioned = l.unionByName(r.select(*l.columns))

    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tb").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = F.last(F.col("__r"), ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tb").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picked = F.first(F.col("__r"), ignorenulls=True).over(w)

    matched = unioned.select("*", picked.alias("__m"))
    return matched.filter(F.col("__side") == l_tag).select(
        *left.columns,
        *[F.col("__m")[c].alias(f"{c}{suffix}") for c in rcols],
    )
