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
