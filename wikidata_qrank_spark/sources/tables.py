"""Parquet table loaders for the synthetic corpus.

The reference persists every dataset as a sorted compressed text file on
S3 (doc/design.md:58-120); our equivalent is columnar parquet/Iceberg —
column pruning and predicate pushdown then come free from Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Table loader with a catalog-first escape hatch.

    Set ``SPARK_GRAFT_CATALOG`` to read ``<catalog>.<name>`` through the
    session catalog instead of parquet files — the idiomatic entry for
    an Iceberg deployment (``spark.table`` on an Iceberg catalog table
    gets snapshot isolation, partition pruning, and metadata-column
    access like ``_partition``/snapshot id for the lineage columns in
    plans/checkpoint.py). ``SPARK_GRAFT_CATALOG=.`` means the current
    catalog/temp-view namespace. The sandbox ships no Iceberg jars, so
    the default stays the parquet directory — same schema, same plans.
    """
    catalog = os.environ.get("SPARK_GRAFT_CATALOG")
    if catalog:
        qualified = name if catalog == "." else f"{catalog}.{name}"
        return spark.table(qualified)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
