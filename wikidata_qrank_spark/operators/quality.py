"""Declarative data-quality constraint checking (dbt-test / Deequ
pattern): each rule is a boolean column over a table; the report is one
row per rule with checked/violation counts. A pipeline gates promotion
of a checkpoint snapshot on `n_violations == 0` for its blocking rules.

Scale shape: each rule aggregates its own table with a map-side partial
count (no shuffle beyond the 1-row agg); rules over the same table
share a scan when passed as one multi-condition call. Referential
rules are expressed by the caller as a left join + IS NOT NULL flag so
THIS module stays join-strategy-agnostic.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_summary(rules: dict[str, tuple[DataFrame, Column]]) -> DataFrame:
    """(rule, n_checked, n_violations) for each named rule; a violation
    is a row where the rule's condition is NOT true (NULL counts as a
    violation — unknown is not a pass). Rules over the SAME DataFrame
    object are folded into one aggregate, so a table with N rules is
    scanned once, not N times."""
    if not rules:
        raise ValueError("no rules given")
    by_df: dict[int, tuple[DataFrame, list[tuple[str, Column]]]] = {}
    for name, (df, cond) in rules.items():
        by_df.setdefault(id(df), (df, []))[1].append((name, cond))
    parts = []
    for df, named_conds in by_df.values():
        agg = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_checked"),
            *[
                F.count(F.when(~F.coalesce(cond, F.lit(False)), F.lit(1)))
                .cast("long")
                .alias(f"__v{i}")
                for i, (_, cond) in enumerate(named_conds)
            ],
        )
        for i, (name, _) in enumerate(named_conds):
            parts.append(
                agg.select(
                    F.lit(name).alias("rule"),
                    "n_checked",
                    F.col(f"__v{i}").alias("n_violations"),
                )
            )
    return reduce(lambda a, b: a.unionByName(b), parts)
