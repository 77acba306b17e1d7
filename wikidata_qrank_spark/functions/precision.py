"""Deterministic cross-engine rounding.

``F.round`` on doubles and DuckDB's ``round`` disagree on exact
half-way decimals (HALF_EVEN-ish vs HALF_UP), which breaks value-hash
parity on boundary values like 0.9468085. ``round6`` pins the rule to
floor(x*1e6 + 0.5)/1e6 — pure IEEE ops, so both engines compute the
identical double given the identical input double. The oracle SQL uses
the same formula textually.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def round6(col):
    return F.floor(col * 1000000.0 + 0.5) / 1000000.0


def floor_div(expr: str, divisor: int):
    """Sign-corrected long floor division matching DuckDB's ``//``.

    Spark's ``div`` truncates toward zero, so negative values (e.g.
    pre-1970 epoch micros) land one bucket high; this corrects the
    quotient when the remainder is negative, all in long arithmetic
    (double division loses exactness above 2^53)."""
    q = F.expr(f"({expr}) div {divisor}")
    r = F.expr(f"({expr}) % {divisor}")
    return F.when(r < 0, q - F.lit(1)).otherwise(q).cast("long")


ROUND6_SQL = "floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"


def r6(expr: str) -> str:
    """SQL-side round6 for oracle queries."""
    return ROUND6_SQL.format(expr=expr)
