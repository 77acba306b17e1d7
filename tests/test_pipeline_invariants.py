"""Pipeline invariants on the real sf0.001 corpus.

* span-sequence equality (kind, text, media_ref, order) — the per-row
  invariant of BASELINE.json input_hint, asserted between the exploded
  span view and the packed nested docs table.
* Arrow mention kernel ≡ broadcast-join mention detection.
* redirect canonicalization: no canonical id retains an outgoing edge.
* physical-plan assertions: the mention join is a BroadcastHashJoin and
  the parquet scan prunes to the needed columns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wikidata_qrank_spark.operators.linking import canonical_dictionary
from wikidata_qrank_spark.operators.mentions import text_mentions, text_mentions_arrow
from wikidata_qrank_spark.plans.pipeline import build_graph
from wikidata_qrank_spark.sources.interleaved import dictionary, docs_with_spans, redirects, spans
from wikidata_qrank_spark.sources.tables import load_table


def test_span_sequence_equality(spark):
    documents = load_table(spark, SF_SMOKE, "documents")
    flat = spans(documents)
    packed = docs_with_spans(documents)
    unpacked = packed.select(
        "doc_id", F.posexplode("spans").alias("idx", "s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
        "idx",
    )
    # order preserved: idx within the packed array == offset ordering
    bad_order = unpacked.filter(F.col("idx") != F.col("offset")).count()
    assert bad_order == 0
    # set equality of (doc_id, offset, kind, text, media_ref)
    cols = ["doc_id", "offset", "kind", "text", "media_ref"]
    diff = flat.select(cols).exceptAll(unpacked.select(cols)).count()
    diff2 = unpacked.select(cols).exceptAll(flat.select(cols)).count()
    assert diff == 0 and diff2 == 0


def test_arrow_mentions_match_join_mentions(spark):
    documents = load_table(spark, SF_SMOKE, "documents")
    sp = spans(documents)
    cdict = canonical_dictionary(dictionary(documents), redirects(dictionary(documents)))
    a = text_mentions(sp, cdict)
    b = text_mentions_arrow(sp, cdict)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_canonical_ids_have_no_outgoing_redirects(spark):
    documents = load_table(spark, SF_SMOKE, "documents")
    d = dictionary(documents)
    red = redirects(d)
    cdict = canonical_dictionary(d, red)
    leftover = cdict.join(
        red, cdict.item_id == red.alias_id, "inner"
    ).count()
    assert leftover == 0


def test_mention_join_is_broadcast_and_scan_prunes(spark):
    g = build_graph(spark, SF_SMOKE)
    plan = g["text_mentions"]._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    scan_plan = g["spans"]._jdf.queryExecution().executedPlan().toString()
    # spans only needs doc_id + text from the parquet scan
    assert "n_chars" not in scan_plan and "lang" not in scan_plan


def test_qviews_totals_conserved(spark):
    g = build_graph(spark, SF_SMOKE)
    total_mentions = g["text_mentions"].count()
    total_views = g["qviews"].agg(F.sum("views")).collect()[0][0]
    assert total_mentions == total_views


def test_pipeline_from_real_interleaved_table(spark, tmp_path):
    """The engine consumes an actual nested interleaved table (the
    input_hint shape) and produces identical results to the derived
    span path — a user with a real interleaved Iceberg/parquet corpus
    plugs in at spans_from_interleaved."""
    from wikidata_qrank_spark.operators.qrank import qviews
    from wikidata_qrank_spark.sources.interleaved import spans_from_interleaved

    documents = load_table(spark, SF_SMOKE, "documents")
    nested_path = str(tmp_path / "interleaved")
    docs_with_spans(documents).write.parquet(nested_path)
    nested = spark.read.parquet(nested_path)

    d = dictionary(documents)
    cdict = canonical_dictionary(d, redirects(d))

    via_nested = text_mentions(spans_from_interleaved(nested), cdict)
    via_derived = text_mentions(spans(documents), cdict)
    assert via_nested.exceptAll(via_derived).count() == 0
    assert via_derived.exceptAll(via_nested).count() == 0

    qv_nested = {(r.item_id, r.views) for r in qviews(via_nested).collect()}
    qv_derived = {(r.item_id, r.views) for r in qviews(via_derived).collect()}
    assert qv_nested == qv_derived


def test_arrow_mentions_guard_falls_back_to_jvm_join(spark):
    """With a 1-row guard the Arrow kernel must refuse the driver
    collect and fall back to the JVM broadcast join — identical rows."""
    documents = load_table(spark, SF_SMOKE, "documents")
    sp = spans(documents)
    d = dictionary(documents)
    cdict = canonical_dictionary(d, redirects(d))
    arrow = text_mentions_arrow(sp, cdict)
    fallback = text_mentions_arrow(sp, cdict, max_dict_rows=1)
    assert fallback.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(fallback).count() == 0


def test_fused_kernel_guard_raises_past_threshold(spark):
    import pytest

    from wikidata_qrank_spark.operators.fused import kg_partials
    from wikidata_qrank_spark.operators.mentions import DictionaryTooLargeError

    documents = load_table(spark, SF_SMOKE, "documents")
    d = dictionary(documents)
    with pytest.raises(DictionaryTooLargeError):
        kg_partials(documents, d, max_dict_rows=1).count()


def test_triples_arrow_guard_falls_back(spark):
    from wikidata_qrank_spark.operators.links import triples_arrow

    documents = load_table(spark, SF_SMOKE, "documents")
    d = dictionary(documents)
    cdict = canonical_dictionary(d, redirects(d))
    arrow = triples_arrow(documents, cdict)
    fallback = triples_arrow(documents, cdict, max_dict_rows=1)
    assert fallback.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(fallback).count() == 0


def test_sql_catalog_matches_dataframe_api(spark):
    """spark.sql over the registered catalog returns the same rows as
    the DataFrame API, and raw tables are queryable by name."""
    from tests.conftest import SF_SMOKE
    from wikidata_qrank_spark.plans.pipeline import build_graph
    from wikidata_qrank_spark.plans.sql_catalog import register_catalog

    names = register_catalog(spark, SF_SMOKE)
    assert "documents" in names and "kg_qrank" in names
    via_sql = {
        (r.item, r.views, r.rank)
        for r in spark.sql("SELECT item, views, rank FROM kg_qrank").collect()
    }
    via_df = {
        (r.item, r.views, r.rank)
        for r in build_graph(spark, SF_SMOKE)["qrank"]
        .select("item", "views", "rank")
        .collect()
    }
    assert via_sql == via_df
    assert spark.sql("SELECT count(*) AS n FROM documents").first().n > 0
