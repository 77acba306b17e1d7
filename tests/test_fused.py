"""Fused Arrow kernel ≡ unfused built-in operators."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from wikidata_qrank_spark.operators.fused import (
    combine_partials,
    kg_partials,
    qviews_from_combined,
    triples_from_combined,
)
from wikidata_qrank_spark.operators.linking import canonical_dictionary
from wikidata_qrank_spark.operators.links import triples
from wikidata_qrank_spark.operators.mentions import text_mentions
from wikidata_qrank_spark.operators.qrank import qviews
from wikidata_qrank_spark.sources.interleaved import dictionary, redirects, spans
from wikidata_qrank_spark.sources.tables import load_table


def test_fused_matches_unfused(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    d = dictionary(docs)
    cdict = canonical_dictionary(d, redirects(d))

    combined = combine_partials(kg_partials(docs, cdict))

    fused_qv = {
        (r.item_id, r.views) for r in qviews_from_combined(combined).collect()
    }
    unfused_qv = {
        (r.item_id, r.views)
        for r in qviews(text_mentions(spans(docs), cdict)).collect()
    }
    assert fused_qv == unfused_qv

    fused_tr = {
        (r.subj, r.pred, r.obj)
        for r in triples_from_combined(combined).collect()
    }
    unfused_tr = {
        (r.subj, r.pred, r.obj)
        for r in triples(text_mentions(spans(docs), cdict)).collect()
    }
    assert fused_tr == unfused_tr


def test_fused_item_signals_match_unfused(spark):
    """signals=True partials finish to the identical item_signals
    relation — the whole reference output set from ONE corpus read."""
    from wikidata_qrank_spark.operators.fused import item_signals_from_combined
    from wikidata_qrank_spark.operators.signals import item_signals
    from wikidata_qrank_spark.operators.mentions import media_mentions
    from wikidata_qrank_spark.sources.interleaved import spans

    docs = load_table(spark, SF_SMOKE, "documents")
    d = dictionary(docs)
    cdict = canonical_dictionary(d, redirects(d))

    combined = combine_partials(kg_partials(docs, cdict, signals=True))
    fused = item_signals_from_combined(combined, cdict)

    sp = spans(docs)
    unfused = item_signals(
        text_mentions(sp, cdict), media_mentions(sp, cdict), docs, cdict
    )
    cols = sorted(fused.columns)
    assert sorted(unfused.columns) == cols
    a = fused.select(*cols)
    b = unfused.select(*cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_vectorized_kernel_matches_loop_kernel(spark):
    """kg_partials_vectorized must produce the identical COMBINED
    relation as the per-token loop kernel, in both lean and signals
    modes (per-batch partials may split differently across batch
    boundaries; the combined sums are the contract)."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.fused import kg_partials_vectorized

    docs = load_table(spark, SF_SMOKE, "documents")
    d = dictionary(docs)
    cdict = canonical_dictionary(d, redirects(d))

    for signals in (False, True):
        loop = combine_partials(kg_partials(docs, cdict, signals=signals))
        vec = combine_partials(kg_partials_vectorized(docs, cdict, signals=signals))
        l_rows = {tuple(r) for r in loop.collect()}
        v_rows = {tuple(r) for r in vec.collect()}
        assert l_rows == v_rows, (
            f"signals={signals}: "
            f"loop-only={list(l_rows - v_rows)[:5]} "
            f"vec-only={list(v_rows - l_rows)[:5]}"
        )
    # edge-case batch: empty text, all-unknown tokens, repeated entity
    weird = spark.createDataFrame(
        [(1, "", 10), (2, "zz yy xx", 9), (3, "zz zz zz", 8)],
        "doc_id long, text string, n_chars long",
    )
    lw = combine_partials(kg_partials(weird, cdict, signals=True)).collect()
    vw = combine_partials(kg_partials_vectorized(weird, cdict, signals=True)).collect()
    assert {tuple(r) for r in lw} == {tuple(r) for r in vw}
