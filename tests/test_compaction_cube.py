"""Changelog compaction + window-frame / cube analytics — small
hand-computed fixtures (the gate checks the real tables vs DuckDB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_qrank_spark.operators.compaction import compact_changelog


def test_compact_changelog_latest_per_key(spark):
    df = spark.createDataFrame(
        [
            (1, 100, 10, "a"),
            (2, 100, 30, "b"),   # later ts wins
            (3, 100, 30, "c"),   # same ts, higher change id wins
            (4, 200, 5, "d"),    # single row key
        ],
        "change_id long, k long, ts long, payload string",
    )
    got = {
        r.k: (r.change_id, r.payload)
        for r in compact_changelog(
            df, key_cols=["k"], ts_col="ts", tiebreak_col="change_id"
        ).collect()
    }
    assert got == {100: (3, "c"), 200: (4, "d")}


def test_compact_changelog_composite_key(spark):
    df = spark.createDataFrame(
        [(1, 1, "x", 10), (2, 1, "x", 20), (3, 1, "y", 5)],
        "change_id long, k1 long, k2 string, ts long",
    )
    out = compact_changelog(
        df, key_cols=["k1", "k2"], ts_col="ts", tiebreak_col="change_id"
    )
    assert {r.change_id for r in out.collect()} == {2, 3}


def test_moving_stats_frame_math(spark, sf_dir):
    """The 5-row moving sum/avg: recompute one user's stream in Python
    from the same cents quantization and compare row-for-row."""
    from wikidata_qrank_spark.plans.analytics import user_moving_stats

    out = user_moving_stats(spark, sf_dir)
    uid = out.select("user_id").first().user_id
    rows = sorted(
        out.filter(F.col("user_id") == uid).collect(),
        key=lambda r: (r.ts_us, r.event_id),
    )
    vals = [r.value_c for r in rows]
    for i, r in enumerate(rows):
        lo = max(0, i - 4)
        frame = vals[lo : i + 1]
        assert r.mov_sum_c == sum(frame)
        assert r.mov_n == len(frame)
        assert r.prev_value_c == (vals[i - 1] if i else None)


def test_sales_cube_grouping_sets(spark, sf_dir):
    """Grand total row equals the sum of the detail rows; grp bitmask
    marks each grouping-set level."""
    from wikidata_qrank_spark.plans.analytics import sales_cube

    rows = sales_cube(spark, sf_dir).collect()
    detail = [r for r in rows if r.grp == 0]
    total = [r for r in rows if r.grp == 3]
    assert len(total) == 1
    assert total[0].returnflag == "ALL" and total[0].linestatus == "ALL"
    assert total[0].n_rows == sum(r.n_rows for r in detail)
    assert total[0].sum_qty_c == sum(r.sum_qty_c for r in detail)
    # subtotal level: one row per distinct returnflag with linestatus='ALL'
    sub_rf = {r.returnflag for r in rows if r.grp == 1}
    assert sub_rf == {r.returnflag for r in detail}


def test_merge_aggregate_state_equals_full_recompute(spark):
    """IVM invariant on a hand dataset, including a key present only in
    the delta and one only in the base."""
    from wikidata_qrank_spark.operators.rollup import merge_aggregate_state

    def agg(df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("s"),
        )

    base = spark.createDataFrame([(1, 10), (1, 20), (2, 5)], "k long, v long")
    delta = spark.createDataFrame([(1, 1), (3, 7)], "k long, v long")
    merged = {
        r.k: (r.n, r.s)
        for r in merge_aggregate_state(agg(base), agg(delta), keys=["k"]).collect()
    }
    full = {
        r.k: (r.n, r.s) for r in agg(base.unionByName(delta)).collect()
    }
    assert merged == full == {1: (3, 31), 2: (1, 5), 3: (1, 7)}


def test_merge_aggregate_state_schema_mismatch_raises(spark):
    import pytest as _pytest

    from wikidata_qrank_spark.operators.rollup import merge_aggregate_state

    a = spark.createDataFrame([(1, 2)], "k long, n long")
    b = spark.createDataFrame([(1, 2)], "k long, m long")
    with _pytest.raises(ValueError):
        merge_aggregate_state(a, b, keys=["k"])


def test_changelog_intervals_scd2(spark):
    """Intervals chain per key (each valid_to = next valid_from), the
    current version is NULL-open, and the NULL-open rows are exactly
    compact_changelog's output."""
    from wikidata_qrank_spark.operators.compaction import (
        changelog_intervals,
        compact_changelog,
    )

    df = spark.createDataFrame(
        [(1, 100, 10, "a"), (2, 100, 30, "b"), (3, 100, 30, "c"), (4, 200, 5, "d")],
        "change_id long, k long, ts long, payload string",
    )
    iv = changelog_intervals(
        df, key_cols=["k"], ts_col="ts", tiebreak_col="change_id"
    ).collect()
    by_id = {r.change_id: r for r in iv}
    assert by_id[1].valid_from == 10 and by_id[1].valid_to == 30
    assert by_id[2].valid_from == 30 and by_id[2].valid_to == 30  # tie chain
    assert by_id[3].valid_to is None and by_id[4].valid_to is None
    current = {r.change_id for r in iv if r.valid_to is None}
    compacted = {
        r.change_id
        for r in compact_changelog(
            df, key_cols=["k"], ts_col="ts", tiebreak_col="change_id"
        ).collect()
    }
    assert current == compacted


def test_funnel_ordering_matters(spark, monkeypatch, tmp_path):
    """A purchase BEFORE the user's first qualifying click must not
    count as stage 3; a user with no signup counts nowhere."""
    from wikidata_qrank_spark.plans.analytics import funnel_counts

    rows = [
        # user 1: full ordered funnel
        (1, 1, "signup", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 11:00:00"),
        (3, 1, "purchase", "2024-01-01 12:00:00"),
        # user 2: purchase precedes the click that follows signup
        (4, 2, "signup", "2024-01-02 10:00:00"),
        (5, 2, "purchase", "2024-01-02 10:30:00"),
        (6, 2, "click", "2024-01-02 11:00:00"),
        # user 3: click/purchase but never signed up
        (7, 3, "click", "2024-01-03 10:00:00"),
        (8, 3, "purchase", "2024-01-03 11:00:00"),
    ]
    df = spark.createDataFrame(
        [(i, u, t, ts) for i, u, t, ts in rows],
        "event_id long, user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).withColumn("value", F.lit(1.0)).withColumn("props", F.lit("{}"))
    src = str(tmp_path / "funnel_events")
    df.write.parquet(src + "/events.parquet")
    got = {r.stage: r.n_users for r in funnel_counts(spark, src).collect()}
    assert got == {"signup": 2, "click": 2, "purchase": 1}


def test_constraint_summary_counts(spark):
    from wikidata_qrank_spark.operators.quality import constraint_summary

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id long, v double"
    )
    out = {
        r.rule: (r.n_checked, r.n_violations)
        for r in constraint_summary(
            {"v_positive": (df, F.col("v") > 0), "id_nonnull": (df, F.col("id").isNotNull())}
        ).collect()
    }
    # NULL v counts as a violation (unknown is not a pass)
    assert out == {"v_positive": (3, 2), "id_nonnull": (3, 0)}


def test_merge_upsert_semantics(spark):
    """Matched rows update, unmatched updates insert, unmatched target
    rows survive, tombstones delete (matched AND unmatched)."""
    from wikidata_qrank_spark.operators.compaction import merge_upsert

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (7, "g")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B", False), (3, "C", False), (7, None, True), (9, None, True)],
        "k long, v string, deleted boolean",
    )
    got = {
        r.k: r.v
        for r in merge_upsert(target, updates, ["k"], deleted_col="deleted").collect()
    }
    assert got == {1: "a", 2: "B", 3: "C"}


def test_merge_upsert_no_tombstones_and_schema_check(spark):
    import pytest as _pytest

    from wikidata_qrank_spark.operators.compaction import merge_upsert

    target = spark.createDataFrame([(1, "a")], "k long, v string")
    updates = spark.createDataFrame([(1, "A"), (2, "B")], "k long, v string")
    got = {r.k: r.v for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {1: "A", 2: "B"}
    bad = spark.createDataFrame([(1, 5)], "k long, w long")
    with _pytest.raises(ValueError):
        merge_upsert(target, bad, ["k"])


def test_compaction_merge_law_fuzz(spark):
    """The law that makes incremental compaction correct:
    compact(log1 ∪ log2) == merge_upsert(compact(log1),
    updates=compact(log2)) whenever log2's changes are newer per key
    than log1's (the CDC batch-ordering invariant). Seeded random
    logs."""
    import random

    from wikidata_qrank_spark.operators.compaction import (
        compact_changelog,
        merge_upsert,
    )

    rng = random.Random(20260817)
    for trial in range(3):
        log1, log2 = [], []
        cid = 0
        for k in range(8):
            for _ in range(rng.randint(0, 4)):
                cid += 1
                log1.append((cid, k, rng.randint(0, 50), f"v{cid}"))
            for _ in range(rng.randint(0, 3)):
                cid += 1
                log2.append((cid, k, rng.randint(100, 150), f"v{cid}"))
        schema = "change_id long, k long, ts long, payload string"
        df1 = spark.createDataFrame(log1 or [(0, -1, 0, "x")], schema)
        df2 = spark.createDataFrame(log2 or [(0, -2, 0, "x")], schema)

        def comp(df):
            return compact_changelog(
                df, key_cols=["k"], ts_col="ts", tiebreak_col="change_id"
            )

        full = {
            r.k: (r.change_id, r.ts, r.payload)
            for r in comp(df1.unionByName(df2)).collect()
        }
        merged = {
            r.k: (r.change_id, r.ts, r.payload)
            for r in merge_upsert(
                comp(df1), comp(df2), key_cols=["k"]
            ).collect()
        }
        assert merged == full, trial
