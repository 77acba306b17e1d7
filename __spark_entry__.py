"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship qrank query at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — matching DuckDB ANSI SQL per query key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wikidata_qrank_spark import oracles
from wikidata_qrank_spark.plans.pipeline import build_graph

_PIPELINE_KEYS = (
    "spans",
    "dictionary",
    "canonical_dictionary",
    "text_mentions",
    "media_mentions",
    "qviews",
    "qrank",
    "triples",
    "item_signals",
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full KG build at sf0.001, return the qrank table."""
    return build_graph(spark, "/root/testdata/sf0.001")["qrank"]


def _pipeline_query(key: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return build_graph(spark, sf_dir)[key]

    run.__name__ = f"kg_{key}"
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for key in _PIPELINE_KEYS:
        out[f"kg_{key}"] = _pipeline_query(key)
    return out


def oracle_sql() -> dict[str, str]:
    return {k: v for k, v in oracles.ORACLES.items() if k in queries()}
