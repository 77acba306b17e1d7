"""Incremental KG maintenance + round-4 operators: IVM qviews,
weighted snapshot diff, gap-fill, repetition, CCNet buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_qviews_incremental_equals_direct(spark):
    from wikidata_qrank_spark.operators.linking import canonical_dictionary
    from wikidata_qrank_spark.operators.mentions import text_mentions
    from wikidata_qrank_spark.operators.qrank import qviews
    from wikidata_qrank_spark.plans.incremental_kg import qviews_incremental
    from wikidata_qrank_spark.sources.interleaved import dictionary, redirects, spans
    from wikidata_qrank_spark.sources.tables import load_table

    documents = load_table(spark, SF_SMOKE, "documents")
    d = dictionary(documents)
    cdict = canonical_dictionary(d, redirects(d))
    direct = {
        (r.item_id, r.views)
        for r in qviews(text_mentions(spans(documents), cdict)).collect()
    }
    incr = {
        (r.item_id, r.views)
        for r in qviews_incremental(
            documents, cdict, F.col("doc_id") % 10 == 0
        ).collect()
    }
    assert incr == direct and len(direct) > 0


def test_snapshot_diff_detects_all_three_changes(spark):
    """Hand-built corpus: doc 0 only in A, doc 1 only in B, doc 2 in
    both — the diff must contain removed, added, and changed edges with
    the right weights."""
    from wikidata_qrank_spark.plans.incremental_kg import triples_snapshot_diff

    docs = spark.createDataFrame(
        [
            # A-only doc derives alpha->beta
            (0, "alpha beta"),
            # B-only doc derives beta->gamma (twice with doc 2's copy)
            (1, "beta gamma"),
            # shared doc derives beta->gamma in both snapshots
            (2, "beta gamma"),
        ],
        "doc_id long, text string",
    )
    # title -> item_id dictionary covering all three tokens
    cdict = spark.createDataFrame(
        [("alpha", 1), ("beta", 2), ("gamma", 3)], "title string, item_id long"
    )
    out = {
        (r.subj, r.obj, r.weight_a, r.weight_b, r.change)
        for r in triples_snapshot_diff(
            docs,
            cdict,
            F.col("doc_id").isin(0, 2),  # snapshot A
            F.col("doc_id").isin(1, 2),  # snapshot B
        ).collect()
    }
    assert ("Q1", "Q2", 1, None, "removed") in out
    assert ("Q2", "Q3", 1, 2, "changed") in out
    assert len(out) == 2  # nothing else differs


def test_gap_fill_dense_axis_and_locf(spark):
    from wikidata_qrank_spark.operators.rollup import gap_fill

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", "click", 1.0),
            (2, "2024-01-01 03:20:00", "click", 2.5),  # 2-hour gap before
            (3, "2024-01-01 01:00:00", "view", 5.0),
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {
        (r.event_type, r.bucket_h, r.n_events, r.value_c, r.value_c_locf)
        for r in gap_fill(ev).collect()
    }
    clicks = sorted(
        [r for r in rows if r[0] == "click"], key=lambda r: r[1]
    )
    # hours 0..3 all present; 1 and 2 are gap buckets carrying LOCF=100
    assert [r[2] for r in clicks] == [1, 0, 0, 1]
    assert [r[3] for r in clicks] == [100, None, None, 250]
    assert [r[4] for r in clicks] == [100, 100, 100, 250]
    assert len([r for r in rows if r[0] == "view"]) == 1  # single bucket


def test_repetition_scores(spark):
    from wikidata_qrank_spark.operators.textstats import repetition_scores

    docs = spark.createDataFrame(
        [
            (0, "a b c a b c a b c"),  # repeated trigrams
            (1, "one two three four"),  # all distinct
            (2, "hi"),  # shorter than n
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_scores(docs).collect()}
    assert rows[0].n_grams == 7 and rows[0].n_distinct == 3
    assert rows[0].rep_ratio > 0.5
    assert rows[1].rep_ratio == 0.0 and rows[1].n_grams == 2
    assert rows[2].n_grams == 0 and rows[2].rep_ratio == 0.0


def test_lm_buckets_partition_corpus(spark):
    from wikidata_qrank_spark.operators.textstats import lm_buckets
    from wikidata_qrank_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = lm_buckets(docs).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r.avg_logp)
    assert set(by_bucket) == {"head", "middle", "tail"}
    # ordering invariant: every head score >= every middle >= every tail
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
    # roughly thirds (quantile bucketing)
    n = len(rows)
    for b in by_bucket.values():
        assert n * 0.2 < len(b) < n * 0.5
