"""SQL surface: register the engine's tables and derived KG views so a
user queries everything in plain ``spark.sql`` — the consumption layer
the reference's downstream users get from the published CSV/TSV files,
here as live Catalyst views (filters and projections written in SQL
still push down into the parquet scans and reuse the same physical
plans as the DataFrame API).

``register_catalog`` is idempotent (temp views overwrite); views are
session-scoped. A production deployment registers the checkpointed
Iceberg tables in a real catalog instead — the name surface is the
same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import TABLES, load_table

KG_VIEWS = ("qviews", "qrank", "triples", "item_signals")


def register_catalog(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register raw tables under their names and the KG outputs as
    ``kg_<name>``; returns the registered view names."""
    from .pipeline import build_graph

    names = []
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    g = build_graph(spark, sf_dir)
    for k in KG_VIEWS:
        g[k].createOrReplaceTempView(f"kg_{k}")
        names.append(f"kg_{k}")
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot convenience: register the catalog, run ``query``."""
    register_catalog(spark, sf_dir)
    return spark.sql(query)
