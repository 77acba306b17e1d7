"""Bucketed checkpoint reuses clustering: no exchange for keyed ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wikidata_qrank_spark.operators.linking import canonical_dictionary
from wikidata_qrank_spark.operators.links import triples
from wikidata_qrank_spark.operators.mentions import text_mentions
from wikidata_qrank_spark.plans.bucketing import checkpoint_bucketed, has_exchange_on
from wikidata_qrank_spark.sources.interleaved import dictionary, redirects, spans
from wikidata_qrank_spark.sources.tables import load_table


def test_bucketed_mentions_window_without_exchange(spark, tmp_path):
    # warehouse dir is a static conf — uses the session default
    # (./spark-warehouse, gitignored); table dropped at the end
    documents = load_table(spark, SF_SMOKE, "documents")
    d = dictionary(documents)
    cdict = canonical_dictionary(d, redirects(d))
    tm = text_mentions(spans(documents), cdict)

    bucketed = checkpoint_bucketed(
        tm, "tm_bucketed", ["doc_id"], num_buckets=8, sort_cols=["doc_id", "offset"]
    )

    # windowed triples over the bucketed table: clustering reused
    tr_bucketed = triples(bucketed)
    tr_plain = triples(tm)
    assert has_exchange_on(tr_plain, "doc_id")
    assert not has_exchange_on(tr_bucketed, "doc_id")

    # identical results
    a = {tuple(r) for r in tr_bucketed.select("subj", "obj").collect()}
    b = {tuple(r) for r in tr_plain.select("subj", "obj").collect()}
    assert a == b

    spark.sql("DROP TABLE IF EXISTS tm_bucketed")


def test_load_table_catalog_escape_hatch(spark, monkeypatch):
    """SPARK_GRAFT_CATALOG routes loads through the session catalog —
    the Iceberg-deployment entry (spark.table) — '.' = current
    namespace; unset = parquet files."""
    from tests.conftest import SF_SMOKE
    from wikidata_qrank_spark.sources.tables import load_table

    base = load_table(spark, SF_SMOKE, "documents")
    base.limit(7).createOrReplaceTempView("documents")
    monkeypatch.setenv("SPARK_GRAFT_CATALOG", ".")
    via_catalog = load_table(spark, SF_SMOKE, "documents")
    assert via_catalog.count() == 7
    monkeypatch.delenv("SPARK_GRAFT_CATALOG")
    assert load_table(spark, SF_SMOKE, "documents").count() == base.count()
    spark.catalog.dropTempView("documents")
