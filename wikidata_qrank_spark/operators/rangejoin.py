"""Range (interval-containment) join — the second classic operator
Spark's built-ins only express as a Cartesian-ish inequality join: all
(point, interval) pairs with ``start ≤ point ≤ end`` per key.

Spark-first shape: Catalyst turns ``p JOIN i ON p.k = i.k AND p.ts
BETWEEN i.s AND i.e`` into an equi-join on ``k`` with the range as a
post-filter — correct, but every point meets every interval of its key
(quadratic on hot keys: a user with 10⁴ events × 10³ intervals is 10⁷
filter evaluations). The bucketed form grids the number line: each
interval replicates to the ⌈span/bucket⌉ buckets it covers, each point
lands in exactly ONE bucket, and the equi-join key becomes
(key, bucket) — work is proportional to true matches + interval spans,
and a point meets an interval through exactly one bucket, so no dedup
pass is needed.

The DuckDB oracle is the plain inequality join — the independent
formulation (DuckDB plans it with its native IEJoin operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
) -> DataFrame:
    """All (point, interval) pairs with ``start ≤ point ≤ end`` and
    equal ``on`` key. ``point_col``/``start_col``/``end_col`` are
    integral columns in the same unit (e.g. epoch microseconds);
    ``bucket`` is the grid width in that unit — pick it near the median
    interval span (too small → many replicas per interval; too large →
    many false candidates per bucket).

    Column names from both inputs are preserved, so they must not
    collide (select/alias beforehand)."""
    if bucket <= 0:
        raise ValueError("bucket must be positive")

    # sign-correct floor division computed entirely in long arithmetic:
    # `/` in Spark is double division, which loses exactness above 2^53
    # and could drop a matching pair at the bucket boundary
    def bucket_of(c: str):
        q = F.expr(f"`{c}` div {bucket}")
        return F.when(
            F.expr(f"`{c}` % {bucket}") < 0, q - F.lit(1)
        ).otherwise(q).cast("long")
    ib = intervals.withColumn(
        "__b", F.explode(F.sequence(bucket_of(start_col), bucket_of(end_col)))
    )
    pb = points.withColumn("__b", bucket_of(point_col))
    return (
        pb.join(ib, [on, "__b"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__b")
    )
