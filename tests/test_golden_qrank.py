"""Golden parity with the reference's qviews/qrank fixtures.

qviews golden: cmd/qrank-builder/qviews_test.go:13-45 — sitelinks joined
with two monthly pageview sets, summed per entity, unmatched keys
dropped. Expected: Q72→13, Q7197→60.

qrank golden: cmd/qrank-builder/qrank_test.go:13-33 — desc rank, asc
entity-id tiebreak: Q4,77 | Q2,42 | Q5,42 | Q1,1 | Q3,1.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_qrank_spark.functions import item_to_id
from wikidata_qrank_spark.operators.qrank import qrank, qviews, salted_sum

SITELINKS = [
    ("af.wikipedia/wards-eiland", "Q7969215"),
    ("am.wikipedia/ዙሪክ", "Q72"),
    ("az.wikipedia/simona_de_bovuar", "Q7197"),
    ("az.wikipedia/sürix", "Q72"),
]

PAGEVIEWS_1 = [
    ("am.wikipedia/ዙሪክ", 7),
    ("az.wikipedia/simona_de_bovuar", 2),
]
PAGEVIEWS_2 = [
    ("am.wikipedia/ዙሪክ", 1),
    ("az.wikipedia/simona_de_bovuar", 58),
    ("az.wikipedia/sürix", 5),
    ("ca.wikipedia/winterthur", 11),  # no sitelink → dropped
]


def test_qviews_golden(spark):
    sitelinks = spark.createDataFrame(SITELINKS, "page_key string, item string")
    pv = spark.createDataFrame(
        PAGEVIEWS_1 + PAGEVIEWS_2, "page_key string, views long"
    )
    # J1: broadcast sitelink dictionary join, then A4 salted per-entity sum
    joined = pv.join(F.broadcast(sitelinks), "page_key").select(
        item_to_id(F.col("item")).alias("item_id"), "views"
    )
    result = qviews(joined, weight_col="views")
    got = {f"Q{r.item_id}": r.views for r in result.collect()}
    assert got == {"Q72": 13, "Q7197": 60}


def test_qrank_golden_order(spark):
    qv = spark.createDataFrame(
        [(1, 1), (2, 42), (3, 1), (4, 77), (5, 42)], "item_id long, views long"
    )
    rows = qrank(qv).orderBy("rank").collect()
    assert [(r.item, r.views) for r in rows] == [
        ("Q4", 77),
        ("Q2", 42),
        ("Q5", 42),
        ("Q1", 1),
        ("Q3", 1),
    ]
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]


def test_salted_sum_matches_plain_sum(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("k"),
        # make key 0 hot: ~half of all rows
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id") % 7).alias("key"),
        (F.col("id") % 13).cast("long").alias("v"),
    )
    salted = {
        (r.key): r.total
        for r in salted_sum(df.select("key", "v"), ["key"], "v", "total").collect()
    }
    plain = {
        r.key: r.total
        for r in df.groupBy("key").agg(F.sum("v").alias("total")).collect()
    }
    assert salted == plain
