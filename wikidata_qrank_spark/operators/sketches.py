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


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    bucket_bits: int = 12,
) -> DataFrame:
    """(group_cols..., __bucket, __mx) — the non-zero HLL registers per
    group. Registers are a MERGEABLE intermediate: union several
    register frames and take ``max(__mx)`` per (group, bucket) to
    sketch the union of the underlying sets — the property
    ``two_hop_approx`` exploits to merge per-mid-node sketches across
    an edge join without ever materializing neighbor pairs."""
    rem_bits = HASH_BITS - bucket_bits

    h = hash60(F.col(value_col))
    bucket = F.shiftrightunsigned(h, rem_bits)
    rem = h.bitwiseAND(F.lit((1 << rem_bits) - 1))
    # rho = leading zeros of the rem_bits-wide remainder + 1;
    # bin() gives the minimal binary string => bit length
    rho = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits + 1) - F.length(F.bin(rem))
    )

    gcols = list(group_cols)
    return (
        df.select(*gcols, bucket.alias("__bucket"), rho.alias("__rho"))
        .groupBy(*gcols, "__bucket")
        .agg(F.max("__rho").alias("__mx"))
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: Sequence[str] = (),
    bucket_bits: int = 12,
) -> DataFrame:
    """Fold (group..., __bucket, __mx) registers into the Flajolet
    estimate — (group..., n_buckets, n_nonzero, hll_estimate)."""
    m = 1 << bucket_bits
    rem_bits = HASH_BITS - bucket_bits
    alpha = 0.7213 / (1.0 + 1.079 / m)
    gcols = list(group_cols)
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
    return hll_estimate_from_registers(
        hll_registers(df, value_col, group_cols, bucket_bits),
        group_cols,
        bucket_bits,
    )


def hll_error_bound(bucket_bits: int) -> float:
    """Theoretical standard error of the estimator (1.04/√m)."""
    return 1.04 / math.sqrt(1 << bucket_bits)


def kmv_overlap_pairs(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 8,
) -> DataFrame:
    """(group_a, group_b, union_est, jaccard_est, inter_est) — KMV
    (k-minimum-values) sketch set algebra between every pair of groups:
    distinct-cardinality of the union, Jaccard similarity, and
    intersection size, all estimated from k-element sketches.

    The sketch of a set is its k smallest hash60 values; |S| ≈
    (k−1)·2^60 / kth_min, the union sketch is the k smallest of the
    merged sketches, and J ≈ |{x ∈ sketch(A∪B): x ∈ sketch(A) ∧ x ∈
    sketch(B)}| / k — the classic KMV estimators, all on exact
    integers until the final divisions (round6'd), so the DuckDB
    oracle reproduces them bit-for-bit. Complements the HLL sketch
    (which cannot intersect): at 100 TB, per-shard KMV sketches merge
    associatively and pairwise overlap costs O(groups²·k), never a
    re-scan.

    Plan: distinct (group, h) → per-group top-k via one window on the
    group partition (state k rows per group) → per-group array →
    pairwise self-join on the tiny sketch table.
    """
    from pyspark.sql import Window

    from ..functions.precision import round6

    h = hash60(F.col(value_col))
    hashed = df.select(F.col(group_col).alias("g"), h.alias("h")).distinct()
    w = Window.partitionBy("g").orderBy("h")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    sketches = topk.groupBy("g").agg(
        F.sort_array(F.collect_list("h")).alias("sk")
    )
    a = sketches.select(F.col("g").alias("group_a"), F.col("sk").alias("sk_a"))
    b = sketches.select(F.col("g").alias("group_b"), F.col("sk").alias("sk_b"))
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    merged = F.slice(F.array_sort(F.array_union("sk_a", "sk_b")), 1, k)
    kth = F.element_at(merged, k)
    full = float(1 << HASH_BITS)
    union_est = F.when(
        F.size(merged) < k, F.size(merged).cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(full) / kth)
    shared = F.size(F.array_intersect(F.array_intersect(merged, "sk_a"), "sk_b"))
    j_est = shared / F.least(F.size(merged), F.lit(k))
    return pairs.select(
        "group_a",
        "group_b",
        round6(union_est).alias("union_est"),
        round6(j_est).alias("jaccard_est"),
        round6(j_est * union_est).alias("inter_est"),
    )


def value_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., bin, bin_lo, n, cum_n) — fixed-bin histogram sketch
    with cumulative counts, the bounded-state substitute for exact
    percentiles at 100 TB: exact ``percentile`` must materialize and
    sort every value per group, while this keeps ``n_bins`` longs per
    group regardless of row count, merges across partitions/batches by
    plain addition (map-side combine does it for free), and answers any
    quantile to ±bin-width. Values outside [lo, hi) clamp into the edge
    bins, so totals are preserved.

    The bin expression is one shared double formula, so the DuckDB
    oracle reproduces the exact bin of every value; counts are then
    integers — the whole sketch is value-hash-stable."""
    from pyspark.sql import Window

    from ..functions.precision import round6

    if hi <= lo:
        raise ValueError(f"hi ({hi}) must be > lo ({lo})")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    groups = group_cols or []
    width = (hi - lo) / n_bins
    raw_bin = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_id = F.least(
        F.greatest(raw_bin, F.lit(0)), F.lit(n_bins - 1)
    ).cast("long")
    counts = (
        df.select(*groups, bin_id.alias("bin"))
        .groupBy(*groups, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return counts.select(
        *groups,
        "bin",
        round6(F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
        "n",
        F.sum("n").over(w).cast("long").alias("cum_n"),
    )


def count_min(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """(group_cols..., d, bucket, cnt) — Count-Min sketch of the key
    frequency distribution: ``depth`` independent hash rows of
    ``width`` counters each. Point estimate for any key = min over the
    ``depth`` counters it hashes to — an upper bound on the true count
    (never under), within εN with probability 1−δ for width = e/ε,
    depth = ln(1/δ) (Cormode & Muthukrishnan 2005).

    Why this shape at 100 TB: like hll_registers, the sketch bounds the
    shuffle — at most groups × depth × width rows leave the map side
    regardless of corpus size (map-side partial aggregation combines
    within each task), versus a full groupBy(key) whose shuffle scales
    with distinct keys. Counters are exact longs summed in any order,
    so the sketch is bit-stable, and MERGEABLE: the sketch of A ∪ B is
    the (d, bucket)-wise SUM of the sketches — plain addition, so
    per-day/per-partition sketches roll up without touching raw data.

    Hashing is the repo's portable md5 scheme (row salt ``d:`` +
    key → hash60 % width), so the DuckDB oracle and any non-Spark
    writer derive the identical counters (the same portability
    argument as the HLL above; Spark's xxhash-based functions are
    JVM-internal).
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    groups = list(group_cols)
    # Round 6 (guide §2.3 "aggregate before you shuffle"): count per
    # KEY first — a partial-aggregated keyed shuffle bounded by
    # per-task distinct keys — then hash only DISTINCT keys into their
    # depth coordinates and sum the counts. The md5 family runs
    # depth × |vocab| times instead of depth × |occurrences|; the
    # counter values are identical (Σ_{keys→bucket} count(key)), and
    # the final (d, bucket) aggregation still caps the sketch shuffle
    # at groups × depth × width rows.
    per_key = df.groupBy(*groups, key_col).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    coords = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                (
                    hash60(
                        F.concat_ws(
                            ":", F.lit(str(d)), F.col(key_col).cast("string")
                        )
                    )
                    % width
                ).cast("long").alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        per_key.select(*groups, F.explode(coords).alias("p"), "__c")
        .select(*groups, "p.d", "p.bucket", "__c")
        .groupBy(*groups, "d", "bucket")
        .agg(F.sum("__c").cast("long").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(key, est) — Count-Min point queries: min over the depth
    counters each key hashes to; absent counters read 0. The keys
    side re-derives the same (d, bucket) coordinates and joins the
    sketch on them — sketch side is at most depth × width rows, an
    always-broadcastable constant, so the probe is map-side."""
    coords = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                (
                    hash60(
                        F.concat_ws(
                            ":", F.lit(str(d)), F.col(key_col).cast("string")
                        )
                    )
                    % width
                ).cast("long").alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    probes = keys.select(
        F.col(key_col).alias("key"), F.explode(coords).alias("p")
    ).select("key", "p.d", "p.bucket")
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )


def hll_window_rollup(
    events: DataFrame,
    value_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket_bits: int = 12,
) -> DataFrame:
    """Mergeable distinct-count rollup: per (event_type, hour) HLL
    registers folded ONCE from the raw events, then rolled up to the
    day level by pure register max-merge — rows (event_type, bucket_us,
    grain 'hour'|'day', n_buckets, n_nonzero, hll_estimate). This is
    the warehouse pattern exact distinct counts can't give you: a
    day's distinct users come from merging the 24 hourly sketches
    (registers are the stored aggregate), never from re-scanning the
    day's raw events — and the same merge extends to weeks/months or
    late-arriving partitions.

    Scale shape: one (type, hour, bucket)-keyed partial aggregation
    over the events scan (≤ types × hours × 2^bits rows leave the map
    side), then a register max-merge keyed on (type, day, bucket) —
    both shuffles bounded by sketch size, independent of event count.
    The hourly register table is eagerly truncated: it feeds BOTH its
    own estimate and the day merge (the diamond rule). Portable md5
    registers — the oracle derives bit-identical sketches at both
    grains."""
    hourly_src = events.select(
        F.col(type_col).alias("event_type"),
        F.date_trunc("hour", F.col(ts_col)).alias("__h"),
        F.col(value_col).cast("string").alias("__c"),
    )
    regs_h = hll_registers(
        hourly_src, "__c", ["event_type", "__h"], bucket_bits
    ).localCheckpoint(eager=True)
    est_h = hll_estimate_from_registers(
        regs_h, ["event_type", "__h"], bucket_bits
    ).select(
        "event_type",
        F.unix_micros(F.col("__h")).alias("bucket_us"),
        F.lit("hour").alias("grain"),
        "n_buckets",
        "n_nonzero",
        "hll_estimate",
    )
    regs_d = (
        regs_h.select(
            "event_type",
            F.date_trunc("day", F.col("__h")).alias("__d"),
            "__bucket",
            "__mx",
        )
        .groupBy("event_type", "__d", "__bucket")
        .agg(F.max("__mx").alias("__mx"))
    )
    est_d = hll_estimate_from_registers(
        regs_d, ["event_type", "__d"], bucket_bits
    ).select(
        "event_type",
        F.unix_micros(F.col("__d")).alias("bucket_us"),
        F.lit("day").alias("grain"),
        "n_buckets",
        "n_nonzero",
        "hll_estimate",
    )
    return est_h.unionByName(est_d)
