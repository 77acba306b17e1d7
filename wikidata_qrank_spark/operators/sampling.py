"""Deterministic stratified sampling.

`df.sample()` is seed-dependent on partitioning and task scheduling —
useless when the sample must be reproducible across engines, re-runs, or
resumed checkpoints. This sampler decides per ROW from a content hash
(the portable md5→60-bit scheme of operators/sketches.py), so the same
row always gets the same verdict: stable under repartitioning, retries,
and incremental appends, and an independent engine can reproduce the
exact sample — which is how the gate checks it.

Per-stratum rates ride a broadcast dim join (map-side; works for any
stratum cardinality), not a hard-coded CASE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60


def hash_sample(
    df: DataFrame, id_col: str, permille: int, salt: str = "sample"
) -> DataFrame:
    """Keep rows where md5(salt:id) mod 1000 < permille — a
    deterministic ~permille/1000 sample."""
    h = hash60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return df.filter(h % 1000 < permille)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates_permille: dict[str, int],
    default_permille: int = 100,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    rate (permille), unknown strata fall back to ``default_permille``.
    The hash covers (stratum, id) so changing one stratum's rate never
    perturbs another's sample."""
    spark = df.sparkSession
    rates = spark.createDataFrame(
        [(k, v) for k, v in rates_permille.items()],
        f"{stratum_col} string, __permille int",
    )
    h = hash60(
        F.concat(
            F.lit(f"{salt}:"),
            F.col(stratum_col),
            F.lit(":"),
            F.col(id_col).cast("string"),
        )
    )
    return (
        df.join(F.broadcast(rates), stratum_col, "left")
        .filter(h % 1000 < F.coalesce(F.col("__permille"), F.lit(default_permille)))
        .drop("__permille")
    )


def mixture_resample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    targets_ppm: dict[str, int],
    salt: str = "mix",
) -> DataFrame:
    """Resample ``df`` toward a target group mixture (DoReMi/Pile-style
    domain reweighting, the downsampling case): given target shares in
    ppm per stratum, find the largest total size the bottleneck stratum
    can supply and keep a deterministic hash-Bernoulli sample of each
    stratum at the rate that lands its share on target.

    All arithmetic is exact long division (Spark ``div`` == DuckDB
    ``//`` on non-negative counts), and the per-row verdict is the
    portable md5 hash — so the sample is partition/retry-proof and the
    oracle regenerates it bit-for-bit. Strata missing from
    ``targets_ppm`` get share 0 (dropped). Rates are derived from a
    groups-cardinality aggregation (map-side partials) and ride a dim
    join back; the dim is #strata rows — config-bounded, not
    data-scaled — so the join is always broadcast-eligible (left to
    AQE, no hint).
    """
    if not targets_ppm:
        raise ValueError("targets_ppm must be non-empty")
    for k, v in targets_ppm.items():
        if v <= 0:
            raise ValueError(f"target for {k!r} must be > 0 ppm, got {v}")
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(k, v) for k, v in targets_ppm.items()],
        f"{stratum_col} string, __t_ppm long",
    )
    # eager truncation: the #strata-row aggregate feeds the bottleneck
    # min, the rates dim AND the absent-stratum guard below — one
    # corpus aggregation instead of per-consumer recomputes
    grp = (
        df.join(F.broadcast(tgt), stratum_col)
        .groupBy(stratum_col, "__t_ppm")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .localCheckpoint(eager=True)
    )
    # round-5 ADVICE: a target stratum absent from df would silently
    # vanish from the bottleneck min — the true achievable mixture is
    # size 0, so refuse instead of returning a mixture off target
    observed = {r[0] for r in grp.select(stratum_col).collect()}
    missing = sorted(set(targets_ppm) - observed)
    if missing:
        raise ValueError(
            f"targets_ppm strata absent from df: {missing} — the "
            "requested mixture is unsatisfiable (bottleneck size 0)"
        )
    smax = grp.agg(
        F.min(F.expr("(__n * 1000000) div __t_ppm")).cast("long").alias("__s")
    )
    rates = (
        grp.crossJoin(F.broadcast(smax))
        .withColumn(
            "__rate_ppm",
            F.least(
                F.lit(1000000).cast("long"),
                F.expr("((__s * __t_ppm) div 1000000) * 1000000 div __n"),
            ),
        )
        .select(stratum_col, "__rate_ppm")
    )
    h = hash60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return (
        df.join(rates, stratum_col)
        .filter(h % 1000000 < F.col("__rate_ppm"))
        .drop("__rate_ppm")
    )
