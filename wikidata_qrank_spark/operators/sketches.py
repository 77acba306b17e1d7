"""Distributed cardinality sketches — HyperLogLog with a portable hash.

Spark ships `approx_count_distinct` (its own HLL++), but its register
hashing is JVM-internal, so nothing outside Spark can reproduce the
estimate. This implementation keeps the whole sketch in PORTABLE
primitives — md5 → 60-bit integer, bucket = top bits, rho = leading
zeros of the rest — so an independent engine (the DuckDB oracle) derives
the SAME registers and the SAME estimate, and a deployment can merge
sketches produced by non-Spark writers.

Scale shape: one partial-aggregated shuffle keyed by
(group, bucket) — at most `groups × m` rows leave the map side
regardless of corpus size — then a groups×1 fold. The register→estimate
fold sums exact integers (2^(49−ρ) per register, ≤ 2^61 total), so the
result is bit-stable under any aggregation order; the only float ops
are the final division and the small-range ln() correction (round6'd).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from ..functions.precision import round6

HASH_BITS = 60  # 15 md5 hex chars — fits a signed long (hash60)


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    bucket_bits: int = 12,
) -> DataFrame:
    """Per-group HLL estimate of distinct ``value_col`` values.

    Returns (group_cols..., n_buckets, n_nonzero, hll_estimate). Uses
    the classic Flajolet HLL estimator with the linear-counting
    small-range correction. Standard error ≈ 1.04/√m (m = 2^bucket_bits,
    default 4096 → ~1.6%).
    """
    m = 1 << bucket_bits
    rem_bits = HASH_BITS - bucket_bits
    alpha = 0.7213 / (1.0 + 1.079 / m)

    h = hash60(F.col(value_col))
    bucket = F.shiftrightunsigned(h, rem_bits)
    rem = h.bitwiseAND(F.lit((1 << rem_bits) - 1))
    # rho = leading zeros of the rem_bits-wide remainder + 1;
    # bin() gives the minimal binary string => bit length
    rho = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits + 1) - F.length(F.bin(rem))
    )

    gcols = list(group_cols)
    regs = (
        df.select(*gcols, bucket.alias("__bucket"), rho.alias("__rho"))
        .groupBy(*gcols, "__bucket")
        .agg(F.max("__rho").alias("__mx"))
    )
    # exact-integer register fold: sum of 2^(rem_bits+1-mx), empty
    # buckets contribute 2^(rem_bits+1) each
    # pyspark's shiftleft() only takes a literal bit count — go through
    # the SQL form for a column-valued shift
    two_pow = F.expr(f"shiftleft(CAST(1 AS BIGINT), {rem_bits + 1} - __mx)")
    per_group = regs.groupBy(*gcols).agg(
        F.sum(two_pow).alias("__s_present"),
        F.count(F.lit(1)).cast("long").alias("n_nonzero"),
    )
    full_scale = float(1 << (rem_bits + 1))
    s_total = (
        F.col("__s_present")
        + (F.lit(m) - F.col("n_nonzero")) * F.lit(1 << (rem_bits + 1))
    ).cast("double")
    raw = F.lit(alpha * m * m * full_scale) / s_total
    zeros = F.lit(m) - F.col("n_nonzero")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return per_group.select(
        *gcols,
        F.lit(m).cast("long").alias("n_buckets"),
        "n_nonzero",
        round6(est).alias("hll_estimate"),
    )


def hll_error_bound(bucket_bits: int) -> float:
    """Theoretical standard error of the estimator (1.04/√m)."""
    return 1.04 / math.sqrt(1 << bucket_bits)
