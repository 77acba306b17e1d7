"""Salted (skew-safe) equi-join.

Companion to the salted two-phase aggregation in operators/qrank.py:
when ONE join key carries a disproportionate share of the big side
(the Q5-the-human class of keys), a plain shuffle join lands that whole
key on one reducer and the stage runs at the speed of its hottest task.
Salting spreads each key over ``salt_buckets`` reducers: the big side
gets a deterministic per-row salt, the small side replicates each row
to every bucket, and the join runs on (key, salt). Result-transparent
for any equi-join (each big row still meets every matching small row
exactly once — in exactly one bucket).

Cost model: small side grows ×salt_buckets (use only when the small
side is modest but too big / too skew-prone for a plain broadcast);
big-side shuffle volume is unchanged, its per-task ceiling drops
×salt_buckets. AQE's skew-join split solves the same problem
opportunistically at runtime; this operator is the explicit,
plan-stable form for jobs where the skew is known and recurring.

The salt is a hash of the big side's OWN row (never rand() /
monotonically_increasing_id), so task retries re-derive the same
bucket — exactly-once per row under replay, the same rule as
salted_sum (operators/qrank.py:37-41).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with big-side salting.
    ``how`` supports 'inner' and 'left' (the salted big side is the
    preserved side; 'right'/'full' would need small-side preservation
    across replicas, which salting cannot express)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt_buckets))
    )
    small_r = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")),
    )
    return big_s.join(small_r, [on, "__salt"], how).drop("__salt")
