"""Portable HyperLogLog — accuracy vs exact distinct, determinism
(the gate recomputes the whole sketch in DuckDB and hash-compares)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_qrank_spark.operators.sketches import hll_distinct, hll_error_bound


def _tokens(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
    )


def test_hll_within_error_bound(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    est = {r.lang: r.hll_estimate for r in hll_distinct(toks, "token", ["lang"]).collect()}
    exact = {
        r.lang: r.n
        for r in toks.groupBy("lang").agg(F.countDistinct("token").alias("n")).collect()
    }
    bound = 5 * hll_error_bound(12)  # 5 sigma ≈ 8%
    assert set(est) == set(exact)
    for lang, n in exact.items():
        assert abs(est[lang] - n) <= bound * n + 2, (lang, est[lang], n)


def test_hll_duplicate_insensitive(spark):
    """The estimate depends only on the distinct value set — feeding
    every value 3x changes nothing."""
    vals = spark.range(1000).select(F.concat(F.lit("v"), "id").alias("v"))
    tripled = vals.unionAll(vals).unionAll(vals)
    one = hll_distinct(vals, "v").first().hll_estimate
    three = hll_distinct(tripled, "v").first().hll_estimate
    assert one == three


def test_hll_global_no_groups(spark):
    out = hll_distinct(
        spark.createDataFrame([("a",), ("b",), ("a",)], "v string"), "v"
    ).collect()
    assert len(out) == 1
    # 3 distinct-ish tiny input lands in the linear-counting branch,
    # which is exact to within rounding at this size
    assert abs(out[0].hll_estimate - 2) < 1


def test_stratified_sample_deterministic_and_rated(spark, sf_dir):
    """Same sample under repartitioning; per-stratum rates roughly
    honored; unknown strata use the default."""
    from wikidata_qrank_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rates = {"en": 500, "zh": 250}
    s1 = {r.doc_id for r in stratified_sample(docs, "lang", "doc_id", rates).collect()}
    s2 = {
        r.doc_id
        for r in stratified_sample(
            docs.repartition(17), "lang", "doc_id", rates
        ).collect()
    }
    assert s1 == s2 and len(s1) > 0
    by_lang = {
        r.lang: r.n
        for r in stratified_sample(docs, "lang", "doc_id", rates)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # en keeps roughly half; non-listed langs keep roughly 10%
    assert by_lang.get("en", 0) > 0.25 * totals["en"]
    for lang in totals:
        if lang not in rates:
            assert by_lang.get(lang, 0) < 0.5 * totals[lang]


def test_kmv_overlap_accuracy(spark):
    """Two groups with known 50% overlap (1000 shared of 2000 each):
    k=256 sketches estimate union/intersection within ~20%."""
    from wikidata_qrank_spark.operators.sketches import kmv_overlap_pairs

    a = spark.range(2000).select(F.lit("A").alias("g"), F.concat(F.lit("v"), "id").alias("v"))
    b = spark.range(1000, 3000).select(F.lit("B").alias("g"), F.concat(F.lit("v"), "id").alias("v"))
    r = kmv_overlap_pairs(a.unionByName(b), "v", "g", k=256).first()
    assert abs(r.union_est - 3000) < 600
    assert abs(r.inter_est - 1000) < 400


def test_kmv_exact_mode_small_sets(spark):
    """Fewer distinct values than k: the union estimate is the exact
    merged count and jaccard is exact."""
    from wikidata_qrank_spark.operators.sketches import kmv_overlap_pairs

    df = spark.createDataFrame(
        [("A", "x"), ("A", "y"), ("A", "z"), ("B", "y"), ("B", "z"), ("B", "w")],
        "g string, v string",
    )
    r = kmv_overlap_pairs(df, "v", "g", k=8).first()
    assert r.union_est == 4.0
    assert r.jaccard_est == 0.5
    assert r.inter_est == 2.0


def test_histogram_merge_law_and_quantile_accuracy(spark):
    """The property that makes the histogram a SKETCH: partial
    histograms over any split of the data merge by plain addition into
    the whole-data histogram (mergeability = map-side combine works),
    and the quantile it implies is within one bin width of the exact
    percentile."""
    import random

    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.sketches import value_histogram

    rng = random.Random(99)
    rows = [(i, rng.choice("ab"), rng.uniform(0, 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    kw = dict(lo=0.0, hi=100.0, n_bins=25, group_cols=["g"])
    bin_width = 4.0

    whole = {
        (r.g, r.bin): r.n for r in value_histogram(df, "v", **kw).collect()
    }
    merged: dict = {}
    for mod in (0, 1, 2):
        part = value_histogram(
            df.filter(F.col("id") % 3 == mod), "v", **kw
        ).collect()
        for r in part:
            merged[(r.g, r.bin)] = merged.get((r.g, r.bin), 0) + r.n
    assert merged == whole

    # quantile estimate from cum_n vs exact percentile: within one bin
    hist = value_histogram(df, "v", **kw).collect()
    exact = {
        r.g: r.p50
        for r in df.groupBy("g")
        .agg(F.percentile("v", F.lit(0.5)).alias("p50"))
        .collect()
    }
    for g in ("a", "b"):
        rows_g = sorted([r for r in hist if r.g == g], key=lambda r: r.bin)
        total = rows_g[-1].cum_n
        est = next(
            r.bin_lo for r in rows_g if r.cum_n >= 0.5 * total
        )
        assert abs(est - exact[g]) <= bin_width, (g, est, exact[g])


def test_histogram_clamps_out_of_range(spark):
    from wikidata_qrank_spark.operators.sketches import value_histogram

    df = spark.createDataFrame(
        [(1, -5.0), (2, 0.0), (3, 99.9), (4, 250.0)], "id long, v double"
    )
    rows = {r.bin: r.n for r in value_histogram(df, "v", 0.0, 100.0, 10).collect()}
    assert rows[0] == 2      # -5.0 clamped into bin 0 with 0.0
    assert rows[9] == 2      # 99.9 and the 250.0 overflow share bin 9
    assert sum(rows.values()) == 4  # totals preserved


def test_countmin_merge_law_and_overestimate(spark):
    """Count-Min invariants: (1) sketch(A ∪ B) equals the cell-wise
    SUM of sketch(A) and sketch(B) — the mergeability that lets
    per-partition sketches roll up by addition; (2) every point
    estimate is >= the true count (one-sided error, never under);
    (3) with width >> distinct keys the estimates are exact."""
    from wikidata_qrank_spark.operators.sketches import (
        count_min,
        count_min_estimate,
    )

    a = spark.createDataFrame(
        [("x",)] * 5 + [("y",)] * 2 + [("z",)], "k string"
    )
    b = spark.createDataFrame([("x",)] * 3 + [("w",)] * 4, "k string")
    both = a.unionByName(b)

    def cells(df):
        return {
            (r.d, r.bucket): r.cnt
            for r in count_min(df, "k", depth=3, width=64).collect()
        }

    ca, cb, cu = cells(a), cells(b), cells(both)
    summed: dict = {}
    for c in (ca, cb):
        for k, v in c.items():
            summed[k] = summed.get(k, 0) + v
    assert cu == summed

    true = {"x": 8, "y": 2, "z": 1, "w": 4}
    keys = spark.createDataFrame([(k,) for k in true], "k string")
    sk = count_min(both, "k", depth=3, width=64)
    est = {
        r.key: r.est
        for r in count_min_estimate(sk, keys, "k", depth=3, width=64).collect()
    }
    for k, t in true.items():
        assert est[k] >= t
    assert est == true  # 4 keys in 64 buckets: collisions absent


def test_countmin_validates_params(spark):
    import pytest

    from wikidata_qrank_spark.operators.sketches import count_min

    df = spark.createDataFrame([("x",)], "k string")
    with pytest.raises(ValueError):
        count_min(df, "k", depth=0)
    with pytest.raises(ValueError):
        count_min(df, "k", width=1)


def test_hll_window_rollup_merge_equals_direct(spark):
    """Mergeability, the property the rollup sells: the day-grain
    estimate (register max-merge of the hourly sketches) equals the
    estimate of a sketch built directly from the day's raw events —
    identical registers, identical value. Hourly estimates track exact
    distincts within the m=4096 band."""
    from datetime import datetime

    from wikidata_qrank_spark.operators.sketches import (
        hll_distinct,
        hll_window_rollup,
    )

    rows = [
        (i, datetime(2024, 1, 1, i % 5, i % 60), i % 37, "click")
        for i in range(300)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = hll_window_rollup(ev)
    day = [r for r in out.collect() if r.grain == "day"]
    assert len(day) == 1
    direct = (
        hll_distinct(
            ev.selectExpr("CAST(user_id AS STRING) AS __c"), "__c"
        ).collect()[0]
    )
    assert day[0].hll_estimate == direct.hll_estimate
    assert day[0].n_nonzero == direct.n_nonzero
    exact = 37
    assert abs(day[0].hll_estimate - exact) <= max(3.0, 0.1 * exact)
