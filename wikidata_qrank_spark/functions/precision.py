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


def trunc_div(expr: str, divisor: int):
    """Long division truncating toward zero — the semantics BOTH
    engines natively share: Spark's ``div`` and DuckDB's ``//`` each
    truncate (verified: ``-7 // 2 = -3`` in DuckDB 1.0.0), so emitting
    plain ``div`` keeps negative quotients (pre-1970 epoch micros,
    negative gradients) in cross-engine lockstep. The previous
    ``floor_div`` here applied a sign correction toward −∞ under the
    mistaken claim that DuckDB floors — which silently diverged from
    every ``//`` oracle on negative non-divisible values (round-5
    ADVICE finding). All in long arithmetic (double division loses
    exactness above 2^53)."""
    return F.expr(f"({expr}) div {divisor}").cast("long")


ROUND6_SQL = "floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"


def r6(expr: str) -> str:
    """SQL-side round6 for oracle queries."""
    return ROUND6_SQL.format(expr=expr)
