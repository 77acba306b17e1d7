"""Bloom-filter semi-join pruning — superset guarantee, false-positive
behavior, and plan shape (the gate proves end-to-end neutrality vs the
plain-join oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_qrank_spark.operators.bloom import bloom_build, bloom_prune


def test_bloom_never_drops_a_true_match(spark):
    dim = spark.range(0, 500, 7).select(F.col("id").alias("k"))
    fact = spark.range(2000).select(F.col("id").alias("k"))
    pos = bloom_build(dim, "k")
    kept = {r.k for r in bloom_prune(fact, "k", pos).collect()}
    true_keys = {r.k for r in dim.collect()}
    assert true_keys <= kept


def test_bloom_small_filter_prunes_hard(spark):
    """With m_bits >> k·|dim| the false-positive rate is tiny: almost
    everything outside the dim key set is dropped map-side."""
    dim = spark.range(100).select(F.col("id").alias("k"))
    fact = spark.range(100_000).select(F.col("id").alias("k"))
    kept = bloom_prune(fact, "k", bloom_build(dim, "k")).count()
    assert 100 <= kept < 200  # fp rate ~ (k*n/m)^k ≈ 2e-11 here


def test_bloom_prune_is_map_side(spark):
    """No shuffle of the fact: the physical plan must contain only
    BroadcastExchange (the positions), never an Exchange hashpartitioning
    of the fact side before the semi joins."""
    dim = spark.range(50).select(F.col("id").alias("k"))
    fact = spark.range(10_000).select(F.col("id").alias("k"), F.lit("x").alias("payload"))
    plan = (
        bloom_prune(fact, "k", bloom_build(dim, "k"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    # every shuffle in the plan belongs to the (tiny) positions build
    # side — the fact lineage itself must have none
    assert plan.count("hashpartitioning(") == plan.count("hashpartitioning(pos#")


def test_salted_join_equals_plain_join(spark):
    """Inner and left salted joins reproduce the plain join exactly,
    including unmatched-left rows and duplicate small-side keys."""
    from wikidata_qrank_spark.operators.skewjoin import salted_join

    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (9, "z")], "k long, payload string"
    )
    small = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "w")], "k long, tag string"
    )
    for how in ("inner", "left"):
        plain = {
            (r.k, r.payload, r.tag)
            for r in big.join(small, "k", how).collect()
        }
        salted = {
            (r.k, r.payload, r.tag)
            for r in salted_join(big, small, on="k", how=how, salt_buckets=4).collect()
        }
        assert salted == plain, how


def test_salted_join_spreads_hot_key(spark):
    """A hot key's rows land in every salt bucket (the point of the
    exercise): check the pre-join salt distribution directly."""
    from pyspark.sql import functions as F

    big = spark.range(4000).select(F.lit(7).alias("k"), F.col("id"))
    salted = big.withColumn("__salt", F.pmod(F.xxhash64(*big.columns), F.lit(16)))
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets == 16


def test_salted_join_rejects_right_join(spark):
    import pytest as _pytest

    from wikidata_qrank_spark.operators.skewjoin import salted_join

    df = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError):
        salted_join(df, df, on="k", how="right")


def test_salted_join_fuzz_equality(spark):
    """Seeded random tables (dup keys, unmatched keys both sides, NULL
    keys): salted inner/left == plain inner/left."""
    import random

    from wikidata_qrank_spark.operators.skewjoin import salted_join

    rng = random.Random(20260817)
    for trial in range(3):
        big = spark.createDataFrame(
            [
                (rng.choice([None, *range(6)]), rng.randint(0, 99))
                for _ in range(60)
            ],
            "k long, payload long",
        )
        small = spark.createDataFrame(
            [(rng.choice(range(8)), rng.randint(0, 9)) for _ in range(10)],
            "k long, tag long",
        )
        from collections import Counter

        for how in ("inner", "left"):
            plain = Counter(
                (r.k, r.payload, r.tag) for r in big.join(small, "k", how).collect()
            )
            salted = Counter(
                (r.k, r.payload, r.tag)
                for r in salted_join(big, small, on="k", how=how, salt_buckets=4).collect()
            )
            assert salted == plain, (trial, how)
