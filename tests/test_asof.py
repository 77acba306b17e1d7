"""As-of join operator — union + running-last window vs hand-computed
expectations (the gate checks it against DuckDB's native ASOF JOIN)."""

from __future__ import annotations

from wikidata_qrank_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_basic_ties_and_no_match(spark):
    left = _df(spark, [
        (1, 10, 5),   # before any right row → no match
        (1, 20, 6),   # matches right at 20 (inclusive tie)
        (1, 35, 7),   # matches right at 30
        (2, 50, 8),   # other key: matches right at 45
    ], "k long, ts long, lv long")
    right = _df(spark, [
        (1, 20, 100),
        (1, 30, 200),
        (2, 45, 300),
        (3, 1, 400),   # unrelated key
    ], "k long, ts long, rv long")
    got = {
        (r.k, r.ts): r.rv_asof
        for r in asof_join(left, right, on="k", ts_col="ts").collect()
    }
    assert got == {(1, 10): None, (1, 20): 100, (1, 35): 200, (2, 50): 300}


def test_asof_forward_direction(spark):
    left = _df(spark, [(1, 10, 0), (1, 25, 0), (1, 99, 0)], "k long, ts long, lv long")
    right = _df(spark, [(1, 20, 100), (1, 30, 200)], "k long, ts long, rv long")
    got = {
        r.ts: r.rv_asof
        for r in asof_join(left, right, on="k", ts_col="ts", direction="forward").collect()
    }
    assert got == {10: 100, 25: 200, 99: None}


def test_asof_duplicate_right_rows_tiebreak(spark):
    """Duplicate right rows at one (key, ts): the greatest tiebreak id
    wins deterministically."""
    left = _df(spark, [(1, 20, 0)], "k long, ts long, lv long")
    right = _df(spark, [(1, 20, 7, 100), (1, 20, 9, 200), (1, 20, 8, 150)],
                "k long, ts long, rid long, rv long")
    row = asof_join(
        left, right, on="k", ts_col="ts", right_cols=["rv"], tiebreak_col="rid"
    ).first()
    assert row.rv_asof == 200


def test_asof_null_right_field_stays_with_its_row(spark):
    """A legitimately-NULL right column must come from the MATCHED row,
    not fall back to an older right row's value (struct carry)."""
    left = _df(spark, [(1, 40, 0)], "k long, ts long, lv long")
    right = _df(spark, [(1, 10, 111, 1), (1, 30, None, 2)],
                "k long, ts long, rv long, rid long")
    row = asof_join(
        left, right, on="k", ts_col="ts", right_cols=["rv", "rid"]
    ).first()
    assert row.rid_asof == 2
    assert row.rv_asof is None  # from the matched row, not 111


def test_range_join_bucketed_matches_naive(spark):
    """Bucketed-interval range join == the naive inequality join on a
    corpus with boundary hits, bucket-spanning intervals, and hot keys."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.rangejoin import range_join

    pts = [(k, t, 100 * k + t) for k in (1, 2) for t in range(0, 100, 7)]
    points = spark.createDataFrame(pts, "k long, p long, pid long")
    ivs = [
        (1, 0, 10, 1),    # exact-boundary interval
        (1, 10, 40, 2),   # spans several buckets (bucket=8)
        (1, 95, 300, 3),  # extends past all points
        (2, 13, 13, 4),   # degenerate single-point interval
        (3, 0, 99, 5),    # key with no points
    ]
    intervals = spark.createDataFrame(ivs, "k long, s long, e long, iid long")
    got = {
        (r.pid, r.iid)
        for r in range_join(
            points, intervals, on="k", point_col="p", start_col="s",
            end_col="e", bucket=8,
        ).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.join(
            intervals, ["k"]
        ).filter((F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e"))).collect()
    }
    assert got == naive and len(got) > 5


def test_rollup_cascade_levels_consistent(spark):
    """Every coarser level's totals must equal the sum of its finer
    children (the continuous-aggregate invariant), and the week level
    equals a direct aggregation from raw."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.rollup import rollup_cascade
    from wikidata_qrank_spark.sources.tables import load_table

    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    r = rollup_cascade(ev)
    totals = {
        row.level: (row.n, row.v)
        for row in r.groupBy("level")
        .agg(F.sum("n_events").alias("n"), F.sum("value_c").alias("v"))
        .collect()
    }
    assert totals["hour"] == totals["day"] == totals["week"]
    n_raw = ev.count()
    assert totals["hour"][0] == n_raw


def test_range_join_exact_past_2_53(spark):
    """Regression for the advisor's round-3 finding: bucket_of used
    double division, which loses exactness above 2^53 and could drop a
    boundary match. The long floor-division form must pair points and
    intervals exactly at magnitudes where doubles round — including
    negative values (floor, not truncate-toward-zero)."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.rangejoin import range_join

    big = 1 << 60
    # points sit exactly on interval boundaries at ±2^60; double
    # division by 7 rounds these, long div must not
    pts = [
        (1, big + 1, 1),
        (1, big + 7, 2),
        (1, -big - 1, 3),
        (1, -big - 7, 4),
    ]
    ivs = [
        (1, big + 1, big + 7, 10),      # both points are boundary hits
        (1, -big - 7, -big - 1, 11),    # negative-side boundaries
        (1, big + 8, big + 100, 12),    # adjacent, must NOT match
    ]
    points = spark.createDataFrame(pts, "k long, p long, pid long")
    intervals = spark.createDataFrame(ivs, "k long, s long, e long, iid long")
    got = {
        (r.pid, r.iid)
        for r in range_join(
            points, intervals, on="k", point_col="p", start_col="s",
            end_col="e", bucket=7,
        ).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.join(intervals, ["k"])
        .filter((F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e")))
        .collect()
    }
    assert got == naive
    assert got == {(1, 10), (2, 10), (3, 11), (4, 11)}
