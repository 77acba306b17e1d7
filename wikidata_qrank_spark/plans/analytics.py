"""General analytics demos over the TPC-H-ish tables — shows the engine
is a general query layer, not only the KG pipeline. Money amounts are
aggregated in exact integer cents (floor(x*100 + 0.5)) so results are
bit-stable across engines (see functions/precision.py rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _cents(col, scale: int = 100):
    return F.floor(col * scale + F.lit(0.5)).cast("long")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 semantics (quantities/amounts in exact centi-units)."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue_units = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_c"),
            F.sum(revenue_units).alias("sum_disc_price_u"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem ⋈ nation, revenue per nation.

    Only the true dimension (nation, fixed 25 rows) carries a broadcast
    hint. customer SCALES with the fact side (15 M rows at TPC-H sf100)
    — a hard ``F.broadcast`` there is a driver OOM at scale, so that
    join is left to AQE, which still broadcasts when the measured size
    is small."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    revenue_units = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue_units).alias("revenue_u"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def top_orders_per_customer(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Window demo: per-customer top-k orders by price (cents), rank
    tiebreak by orderkey — deterministic under the value hash."""
    o = load_table(spark, sf_dir, "orders")
    cents = _cents(F.col("o_totalprice"))
    w = Window.partitionBy("o_custkey").orderBy(
        cents.desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("price_c", cents)
        .withColumn("order_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("order_rank") <= k)
        .select("o_custkey", "o_orderkey", "price_c", "order_rank")
    )


def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup demo (date functions + agg): orders per
    year/month with revenue in cents — Catalyst folds year()/month()
    into the scan projection; one partial-agg shuffle."""
    o = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    return (
        o.groupBy(
            F.year(ts).cast("int").alias("order_year"),
            F.month(ts).cast("int").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("revenue_c"),
        )
    )


def user_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame analytics: per-user event stream ordered by
    (ts, event_id) with the previous value (lag) and a 5-row moving
    average. The frame sum stays in exact integer cents (long) so the
    only float op is the final division — bit-stable across engines
    regardless of frame-evaluation order. ONE exchange (the window
    partition) serves both window functions."""
    from ..functions.precision import round6

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wf = w.rowsBetween(-4, Window.currentRow)
    return (
        e.select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            _cents(F.col("value")).alias("value_c"),
        )
        .withColumn("prev_value_c", F.lag("value_c", 1).over(w))
        .withColumn("mov_sum_c", F.sum("value_c").over(wf))
        .withColumn("mov_n", F.count(F.lit(1)).over(wf).cast("long"))
        .withColumn("mov_avg_c", round6(F.col("mov_sum_c") / F.col("mov_n")))
    )


def latest_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction demo: the events table read as an upsert
    stream keyed by user_id — current state = the most recent event per
    user (ties on ts broken by max event_id)."""
    from ..operators.compaction import compact_changelog

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
        _cents(F.col("value")).alias("value_c"),
    )
    return compact_changelog(
        e, key_cols=["user_id"], ts_col="ts_us", tiebreak_col="event_id"
    )


def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (grouping sets): lineitem totals at every
    combination of (returnflag, linestatus) including subtotals and the
    grand total, with the grouping bitmask. Spark expands the cube into
    grouping sets and still does ONE partial-agg shuffle; NULL group
    cells are labeled 'ALL' so the gate hash is unambiguous."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_c"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.grouping_id().cast("long").alias("grp"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty_c",
            "sum_base_c",
            "n_rows",
            "grp",
        )
    )


def high_value_revenue_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned fact join: revenue per returnflag over lineitems of
    high-value orders. The fact side is first cut map-side by a
    broadcast bloom of the qualifying orderkeys (operators/bloom.py),
    so only candidates reach the exact join — the pattern that keeps
    the fact shuffle proportional to MATCHES when the dim key set
    outgrows a broadcast hash table. The bloom is correctness-neutral
    (exact join follows), which is exactly what the oracle checks."""
    from ..operators.bloom import bloom_build, bloom_prune

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    hv = o.filter(_cents(F.col("o_totalprice")) > 40_000_000).select("o_orderkey")
    # positions feed k broadcast probes — truncate the lineage once so
    # the dim scan + explode + distinct don't re-execute per probe
    # (localCheckpoint, not persist: nothing to leak after the query)
    positions = bloom_build(hv, "o_orderkey").localCheckpoint(eager=True)
    cand = bloom_prune(li, "l_orderkey", positions)
    return (
        cand.join(hv, cand.l_orderkey == hv.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_c"),
        )
    )


def revenue_by_priority_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact join: lineitem ⋈ orders via salted_join (big-side
    deterministic salt, small side replicated ×16, join on
    (key, salt)), then revenue per order priority. Salting is
    result-transparent — the oracle is the plain join, same contract as
    the salted aggregation behind qviews."""
    from ..operators.skewjoin import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        _cents(F.col("l_extendedprice")).alias("price_c"),
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        salted_join(li, o, on="o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("price_c").cast("long").alias("sum_base_c"),
        )
    )


def funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: signup → first click at-or-after signup → first
    purchase at-or-after that click, per user; output = users reaching
    each stage. All three stage timestamps come from chained window
    aggregates over the SAME user partition — one exchange, no
    re-joins against the event table (the naive formulation joins
    events per stage). The tiny 3-row finish is a global agg."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w = Window.partitionBy("user_id")
    staged = (
        e.withColumn(
            "s_us",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).over(w),
        )
        .withColumn(
            "c_us",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts_us") >= F.col("s_us")),
                    F.col("ts_us"),
                )
            ).over(w),
        )
        .withColumn(
            "p_us",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") >= F.col("c_us")),
                    F.col("ts_us"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("s_us").alias("s_us"),
        F.first("c_us").alias("c_us"),
        F.first("p_us").alias("p_us"),
    )
    counts = per_user.agg(
        F.count(F.col("s_us")).cast("long").alias("signup"),
        F.count(F.col("c_us")).cast("long").alias("click"),
        F.count(F.col("p_us")).cast("long").alias("purchase"),
    )
    steps = F.array(
        F.struct(F.lit(1).alias("step"), F.lit("signup").alias("stage"), F.col("signup").alias("n_users")),
        F.struct(F.lit(2).alias("step"), F.lit("click").alias("stage"), F.col("click").alias("n_users")),
        F.struct(F.lit(3).alias("step"), F.lit("purchase").alias("stage"), F.col("purchase").alias("n_users")),
    )
    return counts.select(F.explode(steps).alias("s")).select(
        F.col("s.step").cast("long").alias("step"),
        F.col("s.stage").alias("stage"),
        F.col("s.n_users").alias("n_users"),
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity WEEK,
    counted per activity week (the synthetic events span one month, so
    weekly buckets give a real matrix where monthly would be 1×1). The
    user→cohort dim is one row PER USER — unbounded at scale — so it
    joins back on a plain user_id shuffle (no broadcast hint; AQE may
    still broadcast when it measures small); the matrix agg then
    shuffles only (cohort, week) pairs."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts").cast("timestamp")).alias("week")
    )
    cohort = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        e.join(cohort, "user_id")
        .select(
            F.unix_micros("cohort_week").alias("cohort_week_us"),
            F.unix_micros("week").alias("activity_week_us"),
            "user_id",
        )
        .distinct()
        .groupBy("cohort_week_us", "activity_week_us")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active_users"))
    )


def orders_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot demo: order counts per month pivoted into one column per
    order status. The status domain is passed EXPLICITLY to pivot() —
    at scale that skips the extra distinct-values job Spark otherwise
    runs, and pins the output schema. Oracle is the portable CASE-sum
    formulation."""
    o = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    monthly = o.select(
        F.year(ts).cast("int").alias("order_year"),
        F.month(ts).cast("int").alias("order_month"),
        "o_orderstatus",
    )
    return (
        monthly.groupBy("order_year", "order_month")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "order_year",
            "order_month",
            F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_open"),
            F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_filled"),
            F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_partial"),
        )
    )


def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operator demo: per customer, whether they have any order
    (semi), none (anti), and only low-value orders (except-style:
    ordered minus high-value). Expressed with left_semi / left_anti
    joins — the shuffle-light forms (no payload columns move, dedup
    for free); the oracle uses EXISTS / NOT EXISTS."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders")
    ordered = c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    )
    never = c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    )
    high = o.filter(_cents(F.col("o_totalprice")) > 30_000_000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    low_only = ordered.join(high, "c_custkey", "left_anti")
    return (
        ordered.withColumn("segment", F.lit("ordered"))
        .unionByName(never.withColumn("segment", F.lit("never_ordered")))
        .unionByName(low_only.withColumn("segment", F.lit("low_value_only")))
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between event types per
    user stream (lag over the user partition, then one count agg) —
    the sequence-mining primitive behind session modeling. Transition
    probability in round6 per source state; integer counts make the
    denominator exact."""
    from ..functions.precision import round6

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        e.withColumn("prev_type", F.lag("event_type", 1).over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wsrc = Window.partitionBy("prev_type")
    return pairs.withColumn(
        "p", round6(F.col("n") / F.sum("n").over(wsrc))
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 pattern (correlated scalar subquery, decorrelated):
    revenue of lineitems whose quantity is below 20% of their part's
    average. The correlated `(SELECT avg(..) WHERE same part)` becomes
    a per-part aggregate joined back — the decorrelation Catalyst
    would do for the subquery form, written explicitly. No broadcast
    hint on the per-part aggregate: it has one row per part, which
    scales with the fact side (20 M rows at TPC-H sf100); AQE
    broadcasts it when the measured size allows. Threshold compares
    exact integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_c = _cents(F.col("l_quantity"))
    per_part = li.groupBy("l_partkey").agg(
        F.sum(qty_c).alias("sum_qty_c"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(qty_c * F.col("n") * 5 < F.col("sum_qty_c"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_c"),
        )
    )


def nation_participation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join demo: per-nation customer counts ⟗ supplier
    counts — nations with only one side present survive with a zero on
    the other (coalesced), which inner/left forms would silently drop."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cc = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    sc = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers")
    )
    return cc.join(sc, "nationkey", "full_outer").select(
        "nationkey",
        F.coalesce("n_customers", F.lit(0)).cast("long").alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).cast("long").alias("n_suppliers"),
    )


def orders_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of orders_pivot: the wide per-month
    status columns stacked back to (year, month, status, n) long form
    via Spark's native unpivot; zero-count cells dropped to keep the
    relation sparse. Composing pivot→unpivot round-trips the table,
    which is what the oracle (plain GROUP BY) checks."""
    wide = orders_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            ["order_year", "order_month"],
            ["n_open", "n_filled", "n_partial"],
            "status_col",
            "n",
        )
        .filter(F.col("n") > 0)
        .select(
            "order_year",
            "order_month",
            F.element_at(
                F.create_map(
                    F.lit("n_open"), F.lit("O"),
                    F.lit("n_filled"), F.lit("F"),
                    F.lit("n_partial"), F.lit("P"),
                ),
                F.col("status_col"),
            ).alias("o_orderstatus"),
            F.col("n").cast("long").alias("n"),
        )
    )


def props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured demo: JSON props column → typed extraction
    (get_json_object, JVM-side) → per-type aggregates."""
    from ..functions.precision import round6

    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"), "value")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count(F.when(F.col("k") > 50, F.lit(1))).cast("long").alias("n_high_k"),
            F.sum("k").cast("long").alias("sum_k"),
            round6(F.sum("value")).alias("total_value"),
        )
    )


def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type — Spark's
    `percentile` and DuckDB's `quantile_cont` share the linear
    interpolation definition and match bit-for-bit (probed); round6
    guards the residual risk."""
    from ..functions.precision import round6

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        round6(F.expr("percentile(value, 0.5)")).alias("p50"),
        round6(F.expr("percentile(value, 0.9)")).alias("p90"),
        round6(F.expr("percentile(value, 0.99)")).alias("p99"),
    )


def shipping_priority(
    spark: SparkSession, sf_dir: str, segment: str = "FURNITURE",
    cut: str = "1998-01-01", k: int = 10,
) -> DataFrame:
    """TPC-H Q3 pattern: un-shipped high-revenue orders for one market
    segment — three-way fact join with date filters pushed to the
    scans, exact-cents revenue aggregate, deterministic top-k (revenue
    desc, orderkey asc). Only the segment filter touches customer, so
    AQE sees a shrunken build side; no hard broadcast hints (customer
    and orders scale with SF)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == segment
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cut).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cut).cast("timestamp")
    )
    revenue_units = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            "o_orderpriority",
        )
        .agg(F.sum(revenue_units).cast("long").alias("revenue_u"))
        .orderBy(F.desc("revenue_u"), F.asc("l_orderkey"))
        .limit(k)
    )


def order_priority_exists(
    spark: SparkSession, sf_dir: str, lo: str = "1997-01-01", hi: str = "1997-07-01"
) -> DataFrame:
    """TPC-H Q4 pattern (EXISTS subquery): orders in a date window that
    have at least one late-shipping lineitem, counted per priority.
    The correlated EXISTS is a LEFT SEMI join — no row multiplication,
    the lineitem side never aggregates."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


def event_anomalies(
    spark: SparkSession, sf_dir: str, z_cut: float = 2.0
) -> DataFrame:
    """(event_type, bucket_h, n_events, z, is_anomaly) — z-score of
    each hourly event count against its type's distribution. Moments
    are computed from exact BIGINT sums (n, Σc, Σc²) rather than a
    streaming stddev, so both engines derive bit-identical doubles:
    var = (Σc² − (Σc)²/n) / (n−1). One aggregation shuffle + one
    broadcast-joined 3-value dim per type."""
    from wikidata_qrank_spark.functions.precision import round6, trunc_div

    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.select(
            "event_type",
            trunc_div(
                "unix_micros(CAST(ts AS TIMESTAMP))", 3_600_000_000
            ).alias("bucket_h"),
        )
        .groupBy("event_type", "bucket_h")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    mom = agg.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("n_events").cast("long").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("s2"),
    )
    joined = agg.join(F.broadcast(mom), "event_type")
    mean = F.col("s1") / F.col("nb")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("nb")) / (
        F.col("nb") - 1
    )
    # zero variance (a perfectly flat series) has no defined z: emit
    # 0/false explicitly — 0.0/0.0 is NaN in Spark but NULL in DuckDB,
    # and Spark sorts NaN above every number so abs(z)>cut would flag
    # every flat bucket anomalous
    z = F.when(var > 0, (F.col("n_events") - mean) / F.sqrt(var)).otherwise(
        F.lit(0.0)
    )
    return joined.filter(F.col("nb") > 1).select(
        "event_type",
        "bucket_h",
        "n_events",
        round6(z).alias("z"),
        (F.abs(z) > z_cut).alias("is_anomaly"),
    )


def local_supplier_volume(
    spark: SparkSession, sf_dir: str, region: str = "EUROPE",
    lo: str = "1996-01-01", hi: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q5 pattern: revenue where the supplier and the ordering
    customer share a nation, per nation of one region. Six-way join:
    the two fixed dims (nation ⋈ region, ≤25 rows) broadcast; customer
    / orders / lineitem / supplier are all SF-scaling and shuffle on
    their keys. The same-nation constraint lands as an equi-join
    condition (c_nationkey == s_nationkey), not a post-filter, so it
    prunes inside the join."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue_units = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(revenue_units).cast("long").alias("revenue_u"))
    )


def forecast_revenue_change(
    spark: SparkSession, sf_dir: str, lo: str = "1997-01-01", hi: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q6 pattern: pure filter-and-sum over the fact table — the
    query whose entire cost is the scan, so the plan test is that
    every predicate reaches the parquet reader and nothing shuffles
    but one 1-row partial-agg exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue_units = _cents(F.col("l_extendedprice") * F.col("l_discount"), 10000)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(revenue_units).cast("long").alias("revenue_u"))
    )


def promo_revenue_share(
    spark: SparkSession, sf_dir: str, lo: str = "1997-01-01", hi: str = "1997-04-01",
) -> DataFrame:
    """TPC-H Q14 pattern: share of revenue from promotional parts in a
    window — conditional aggregation over one fact⋈dim join. The part
    side scales with SF (no hard broadcast hint); the promo predicate
    becomes a CASE inside the sum, so one pass computes both terms.
    Integer-unit sums; ONE final division → round6 (bit-stable)."""
    from ..functions.precision import round6

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    revenue_units = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), revenue_units).otherwise(
        F.lit(0).cast("long")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).cast("long").alias("promo_u"),
            F.sum(revenue_units).cast("long").alias("total_u"),
        )
        .select(
            "promo_u",
            "total_u",
            round6(F.lit(100.0) * F.col("promo_u") / F.col("total_u")).alias(
                "promo_pct"
            ),
        )
    )


def volume_shipping(
    spark: SparkSession, sf_dir: str,
    nation_a: str = "NATION_11", nation_b: str = "NATION_12",
    lo: str = "1996-01-01", hi: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7 pattern: bilateral trade volume between two nations per
    year — revenue where the supplier sits in one nation and the
    ordering customer in the other, both directions reported.

    Scale notes: the two nation dims are true constants (25 rows) and
    broadcast; filtering them to {a, b} BEFORE the join turns the
    symmetric OR predicate into two inner broadcast joins plus one
    cheap post-join inequality (supp_nation != cust_nation), so
    supplier/customer rows outside the two nations are dropped at the
    map side and never reach the fact shuffles."""
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(nation_a, nation_b)
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("snk"),
                             F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("snk"),
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("cnk"),
                             F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cnk"),
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
    )
    revenue_units = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate")).cast("int").alias("l_year"),
        )
        .agg(F.sum(revenue_units).cast("long").alias("revenue_u"))
    )


def national_market_share(
    spark: SparkSession, sf_dir: str,
    target_nation: str = "NATION_2", region: str = "ASIA",
    part_type: str = "ECONOMY",
    lo: str = "1996-01-01", hi: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q8 pattern: the target nation's share of revenue for one
    part type sold into one region, per order year. The share is a
    conditional sum over ONE joined relation — no second pass over the
    facts. Nation/region dims broadcast (constant); part is filtered
    on p_type before its join so only matching partkeys shuffle.
    Integer-unit sums; final division via round6 (bit-stable)."""
    from ..functions.precision import round6

    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    n_cust = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cust_nk"))
    )
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == part_type)
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue_units = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("cust_nk"), "left_semi")
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("supp_nk"))
        .select(
            F.year(F.col("o_orderdate")).cast("int").alias("o_year"),
            revenue_units.alias("rev_u"),
            F.col("supp_nation"),
        )
    )
    target = F.when(
        F.col("supp_nation") == target_nation, F.col("rev_u")
    ).otherwise(F.lit(0).cast("long"))
    return (
        joined.groupBy("o_year")
        .agg(
            F.sum(target).cast("long").alias("target_u"),
            F.sum("rev_u").cast("long").alias("total_u"),
        )
        .select(
            "o_year",
            "target_u",
            "total_u",
            round6(F.col("target_u") / F.col("total_u")).alias("mkt_share"),
        )
    )


def product_profit_by_nation(
    spark: SparkSession, sf_dir: str, name_token: str = "red"
) -> DataFrame:
    """TPC-H Q9 pattern, ADAPTED: profit per supplier nation per year
    for parts whose name contains a token. The reference Q9 subtracts
    ps_supplycost * l_quantity; this corpus has no partsupp table
    (TESTDATA.md), so profit here is discounted revenue only — the
    join/aggregation shape (5-way join, contains-filter on the part
    dim, two-level group key) is what this exercises.

    part is filtered on the name token before joining, so the fact
    shuffle carries only matching partkeys; nation broadcasts."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(name_token)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue_units = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate")).cast("int").alias("o_year"),
        )
        .agg(F.sum(revenue_units).cast("long").alias("profit_u"))
    )


def returned_item_reporting(
    spark: SparkSession, sf_dir: str,
    lo: str = "1996-10-01", hi: str = "1997-01-01", k: int = 20,
) -> DataFrame:
    """TPC-H Q10 pattern: top-k customers by revenue lost to returns
    (l_returnflag = 'R') in one quarter. The per-customer aggregate
    happens BEFORE joining the customer dim, so the (potentially wide)
    customer attributes never ride the fact shuffle; the dim join then
    touches only the aggregated rows. Top-k is a global sort of the
    aggregate (small), tie-broken by custkey so LIMIT is
    deterministic."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    revenue_units = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(revenue_units).cast("long").alias("revenue_u"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            _cents(F.col("c_acctbal")).alias("acctbal_c"),
            F.col("n_name").alias("nation"),
            "revenue_u",
        )
        .orderBy(F.col("revenue_u").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def ship_lag_priority(
    spark: SparkSession, sf_dir: str, year: int = 1997, lag_days: int = 60
) -> DataFrame:
    """TPC-H Q12 pattern, ADAPTED: the reference buckets lineitems by
    l_shipmode and counts urgent vs non-urgent orders among the late
    ones; this corpus has no shipmode/commitdate/receiptdate
    (TESTDATA.md), so the category is the ship-lag bucket
    (datediff(l_shipdate, o_orderdate) thresholded) and "late" keeps
    the same urgent/non-urgent conditional-count split. One fact⋈fact
    equi-join, the CASE counts fold into a single aggregation pass."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.year(F.col("l_shipdate")) == year
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "lag_bucket",
        F.when(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > lag_days,
            F.lit("LATE"),
        ).otherwise(F.lit("ON_TIME")),
    )
    urgent = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return j.groupBy("lag_bucket").agg(
        F.sum(urgent).cast("long").alias("high_line_count"),
        F.sum(1 - urgent).cast("long").alias("low_line_count"),
    )


def customer_order_distribution(
    spark: SparkSession, sf_dir: str, exclude_priority: str = "4-NOT SPECIFIED"
) -> DataFrame:
    """TPC-H Q13 pattern: the distribution of order counts per customer
    — how many customers placed 0, 1, 2, … qualifying orders. The
    reference excludes orders by a comment pattern; this corpus has no
    o_comment (TESTDATA.md) so the stand-in filter excludes one
    priority class. Two-level aggregation with a LEFT outer join so
    zero-order customers survive into the c_count = 0 bucket — the
    semantics inner joins silently lose."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != exclude_priority
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


def top_supplier(
    spark: SparkSession, sf_dir: str,
    lo: str = "1996-01-01", hi: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 pattern: the supplier(s) with maximum revenue in a
    quarter. The revenue "view" is one per-supplier aggregate; the
    correlated `= (SELECT max(...))` becomes a 1-row max joined back
    by equality. The 1-row max side is an explicit broadcast (a true
    constant), so the filter is map-side — no second shuffle of the
    aggregate, and ties all survive exactly as in the spec."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
    )
    revenue_units = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue_units).cast("long").alias("total_revenue_u")
    )
    mx = rev.agg(F.max("total_revenue_u").alias("max_rev_u"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue_u == mx.max_rev_u)
        .join(s, rev.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue_u")
    )


def large_volume_customers(
    spark: SparkSession, sf_dir: str, min_qty: float = 300.0
) -> DataFrame:
    """TPC-H Q18 pattern: orders whose total quantity exceeds a
    threshold, with their customer. The HAVING filter runs on the
    per-order aggregate FIRST, so only the (rare) qualifying orderkeys
    join back to orders/customer — the join input shrinks from all
    orders to the survivors. Quantity threshold compares exact integer
    centi-units."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"))
        .filter(F.col("sum_qty_c") > int(min_qty * 100))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate_s"),
            _cents(F.col("o_totalprice")).alias("totalprice_c"),
            "sum_qty_c",
        )
    )


def disjunctive_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 pattern, ADAPTED: revenue for an OR of three
    brand/size/quantity conjunct groups. The reference's container and
    shipmode predicates don't exist in this corpus (TESTDATA.md); the
    preserved point is that the OR-of-conjuncts lands as ONE join with
    a residual filter referencing both sides — not a UNION of three
    scans — and the part-side-only conjuncts (brand, size) still prune
    the dim before the join."""
    p = load_table(spark, sf_dir, "part").filter(
        (
            (F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
        )
        | (
            (F.col("p_brand") == "Brand#5") & (F.col("p_size").between(10, 30))
        )
        | (
            (F.col("p_brand") == "Brand#9") & (F.col("p_size").between(20, 50))
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#5") & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#9") & q.between(20, 40))
    )
    revenue_units = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(revenue_units).cast("long").alias("revenue_u"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def suppliers_kept_waiting(
    spark: SparkSession, sf_dir: str, late_days: int = 90, k: int = 100
) -> DataFrame:
    """TPC-H Q21 pattern, ADAPTED: suppliers who were the ONLY late
    supplier on a finished multi-supplier order. "Late" in the
    reference is l_receiptdate > l_commitdate; this corpus has neither
    (TESTDATA.md), so late = shipped more than `late_days` after the
    order date. The EXISTS (another supplier on the order) is a LEFT
    SEMI join and the NOT EXISTS (another LATE supplier) a LEFT ANTI
    join — both row-preserving, no row multiplication, computed on the
    (orderkey, suppkey) projection so the wide lineitem columns never
    shuffle twice."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > late_days
        ).alias("is_late"),
    )
    l1 = lines.filter(F.col("is_late")).select("l_orderkey", "l_suppkey")
    l2 = lines.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    ).distinct()
    l3 = (
        lines.filter(F.col("is_late"))
        .select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
        .distinct()
    )
    waiting = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == F.col("o3")) & (l1.l_suppkey != F.col("s3")),
            "left_anti",
        )
    )
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(
            F.col("numwait").desc(), F.col("s_name").asc(), F.col("nation").asc()
        )
        .limit(k)
    )


def idle_rich_customers(
    spark: SparkSession, sf_dir: str,
    nationkeys: tuple = (1, 5, 7, 11, 13, 17, 19),
    idle_since: str = "1999-01-01",
) -> DataFrame:
    """TPC-H Q22 pattern, ADAPTED: customers in a set of countries with
    above-average positive balances and no orders since a cutoff date.
    The reference selects countries by phone prefix and requires zero
    orders ever; this corpus has no c_phone and every synthetic
    customer has at least one order (TESTDATA.md), so the set is
    nation keys and "idle" means no order on/after `idle_since` —
    the same NOT-EXISTS shape over a date-restricted orders scan.
    The scalar avg subquery is a 1-row broadcast; "no recent orders"
    is a LEFT ANTI join against the filtered orders keys — never an
    outer join + null filter, so orders' columns don't shuffle. The
    avg threshold is applied as the cross-multiplied EXACT integer
    inequality bal*n > sum — no float average whose last bit could
    differ between engines."""
    keys = list(nationkeys)
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(keys)
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_cents(F.col("c_acctbal"))).alias("sum_bal_c"),
        F.count(F.lit(1)).cast("long").alias("n_bal"),
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(idle_since).cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(_cents(F.col("c_acctbal")) * F.col("n_bal") > F.col("sum_bal_c"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(_cents(F.col("c_acctbal"))).cast("long").alias("totacctbal_c"),
        )
    )


def brand_small_quantity_revenue(
    spark: SparkSession, sf_dir: str, brand: str = "Brand#3"
) -> DataFrame:
    """TPC-H Q17 pattern (brand-scoped; the brand-blind decorrelated
    form is small_quantity_revenue above): revenue from lineitems of one brand whose
    quantity is below 20% of that part's average lineitem quantity.

    The correlated scalar subquery (per-part avg over ALL lineitems of
    the part, not just the brand's) becomes one per-part aggregate
    joined back on partkey — both sides shuffle on the same key, so
    the join is co-partitioned with no extra exchange. The threshold
    compares cross-multiplied exact integers
    (5 * qty_c * n_part < sum_qty_c  ⇔  qty < 0.2 * avg), so no float
    average can differ between engines. The brand filter prunes the
    part dim BEFORE its join; the per-part aggregate is brand-blind by
    spec but carries only two longs per partkey."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"),
        F.count(F.lit(1)).cast("long").alias("n_li"),
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(
            _cents(F.col("l_quantity")) * 5 * F.col("n_li")
            < F.col("sum_qty_c")
        )
        .agg(
            F.sum(_cents(F.col("l_extendedprice"))).cast("long")
            .alias("revenue_c"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def dominant_part_suppliers(
    spark: SparkSession, sf_dir: str,
    name_token: str = "red", year: int = 1997,
) -> DataFrame:
    """TPC-H Q20 pattern, ADAPTED: suppliers holding a dominant share
    of some part's shipped volume. The reference finds suppliers whose
    partsupp availability exceeds half the year's shipped quantity;
    this corpus has no partsupp (TESTDATA.md), so "excess" becomes
    "shipped MORE THAN HALF of the part's total shipped quantity in
    the year" — the same nested-aggregate + semi-join shape: inner
    per-(part, supplier) aggregate, compared against a per-part
    aggregate, collapsed to a DISTINCT supplier set that semi-joins
    the supplier dim.

    Scale: both aggregates shuffle on partkey (co-partitioned join);
    the part dim is name-filtered before its join; the dominance test
    is the exact integer inequality 2 * qty_supplier > qty_part. The
    supplier dim is probed with a LEFT SEMI join — no row
    multiplication, qualifying keys only."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(name_token)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.year(F.col("l_shipdate")) == year)
        .join(p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_cents(F.col("l_quantity"))).alias("qty_s_c")
    )
    per_p = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_cents(F.col("l_quantity"))).alias("qty_p_c")
    )
    dominant = (
        per_ps.join(per_p, per_ps.l_partkey == F.col("pk"))
        .filter(F.col("qty_s_c") * 2 > F.col("qty_p_c"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


def important_part_volume(
    spark: SparkSession, sf_dir: str, fraction_ppm: int = 100
) -> DataFrame:
    """TPC-H Q11 pattern, ADAPTED: parts whose shipped value exceeds a
    fraction of the global total. The reference sums
    ps_supplycost * ps_availqty over one nation's suppliers; with no
    partsupp table (TESTDATA.md) the measure is shipped lineitem value
    (extendedprice), keeping the defining shape: a grouped aggregate
    HAVING-filtered against a GLOBAL scalar aggregate of the same
    measure. The scalar is a 1-row broadcast; the comparison is the
    exact integer cross-multiplication value * 1e6 > fraction_ppm *
    total (fraction in parts-per-million), so no float threshold."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(_cents(F.col("l_extendedprice"))).alias("value_c")
    )
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("value_c") * F.lit(1_000_000)
            > F.lit(fraction_ppm) * F.col("total_c")
        )
        .select("partkey", "value_c")
    )


def parts_supplier_counts(
    spark: SparkSession, sf_dir: str,
    exclude_brand: str = "Brand#3",
    sizes: tuple = (1, 4, 9, 16, 25, 36, 49),
    exclude_nationkeys: tuple = (3, 14),
) -> DataFrame:
    """TPC-H Q16 pattern, ADAPTED: how many distinct suppliers can
    deliver each (brand, type, size) part group, excluding one brand
    and a supplier blacklist. The reference walks partsupp and
    excludes suppliers by a comment pattern; here the part-supplier
    relation is "shipped at least one lineitem of the part" and the
    blacklist is a nation set (no s_comment in TESTDATA.md).

    Shape preserved: dim-side NOT-filters prune part BEFORE the join,
    the supplier blacklist is an anti-join (never NOT IN against a
    subquery, which is null-hostile and forces a nested loop), and the
    count is DISTINCT suppliers per group — a two-level aggregate:
    dedup (group, supplier) pairs first (map-side combine applies),
    then count, so hot part groups don't funnel raw lineitem rows into
    one reducer."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != exclude_brand)
        & F.col("p_size").isin(list(sizes))
    )
    s_bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey").isin(list(exclude_nationkeys)))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s_bad, li.l_suppkey == s_bad.s_suppkey, "left_anti")
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.count(F.lit(1)).cast("long").alias("supplier_cnt")
    )


def best_supplier_per_part(
    spark: SparkSession, sf_dir: str,
    region: str = "ASIA", size: int = 15,
) -> DataFrame:
    """TPC-H Q2 pattern, ADAPTED: for each part of one size, the
    region's supplier offering it at the lowest price. The reference
    takes min(ps_supplycost) over partsupp; with no partsupp
    (TESTDATA.md) the offer relation is "shipped lineitems" and the
    price is l_extendedprice/l_quantity, kept EXACT as the integer
    pair (price_c = floor over the cheapest lineitem) by electing the
    minimum (unit_price_scaled, suppkey) struct per (part, supplier)
    and then per part — min-of-struct instead of a float min +
    re-join, so ties break deterministically on suppkey.

    Shape preserved from Q2: the region→nation→supplier dim chain
    prunes the offer relation BEFORE aggregation (broadcast dims), and
    the correlated `= (SELECT min ...)` collapses into a per-part
    min-aggregate instead of a second scan. Unit price is scaled to
    integer micro-units per cent-of-quantity: floor(ep*10^6/qty)
    commutes between engines because both divide exact longs."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    n = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", F.col("n_name").alias("nation"))
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == size)
    li = load_table(spark, sf_dir, "lineitem")
    unit_u = F.floor(
        _cents(F.col("l_extendedprice"), 10000) * F.lit(100)
        / _cents(F.col("l_quantity"))
    ).cast("long")
    offers = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            F.struct(
                unit_u.alias("unit_u"),
                F.col("s_suppkey").alias("suppkey"),
                F.col("s_name").alias("s_name"),
                F.col("nation").alias("nation"),
            ).alias("offer"),
        )
    )
    best = offers.groupBy("p_partkey").agg(F.min("offer").alias("best"))
    return best.select(
        F.col("p_partkey").alias("partkey"),
        F.col("best.suppkey").alias("s_suppkey"),
        F.col("best.s_name").alias("s_name"),
        F.col("best.nation").alias("nation"),
        F.col("best.unit_u").alias("unit_u"),
    )
