"""SparkSession factory tuned for this engine.

Local-mode settings mirror what a 1000-executor cluster deployment would
set per-executor: AQE on (runtime skew-join + partition coalescing),
shuffle partitions sized to cores (overridden at scale via
``spark.sql.shuffle.partitions``), Arrow enabled for every pandas-UDF
exchange, zstd-compressed parquet intermediates (the reference compresses
every intermediate with brotli/zstd — doc/design.md:193-223; columnar
zstd parquet is the Spark-native equivalent).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "wikidata_qrank_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` controls both ``local[N]`` and the shuffle-partition count so
    the same code scales from local[8] to a real cluster by changing one
    number (the scaling-efficiency benchmark runs the same job at two
    levels).
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        # Scan parallelism floor (guide §6): Spark's split formula caps
        # splits at max(openCostInBytes, totalBytes/minPartitionNum) —
        # with the 4 MB default openCost a few-MB parquet table scans
        # as 1-2 tasks and every interpreted higher-order expression on
        # it runs on 1-2 cores. A 64 KB open cost + a 2×cores partition
        # floor let small inputs fan out to the full width, while at
        # production scale totalBytes/minPartitionNum exceeds
        # maxPartitionBytes and the defaults (128 MB splits) take over
        # unchanged — i.e. scale-adaptive, not a local[32]-only tune.
        .config("spark.sql.files.openCostInBytes", "65536")
        .config("spark.sql.files.minPartitionNum", str(2 * n))
        # Broadcast ceiling (guide §3.1): 64 MB is well inside what any
        # real executor holds; lets AQE convert mid-size dimension
        # joins (per-doc shingle arrays, vocab dims) to broadcast from
        # their ACTUAL post-shuffle size instead of sort-merging them.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
