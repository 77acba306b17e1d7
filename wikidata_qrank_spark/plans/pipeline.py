"""End-to-end KG-construction pipeline.

Mirrors the reference's Build() stage graph (cmd/qrank-builder/build.go:
20-56) re-expressed as one lazy DataFrame DAG:

    documents ──► spans ──► text/media mentions (broadcast dict join)
                              │ (dictionary canonicalized once via
                              │  iterative redirect resolution)
                              ├─► qviews (salted sum) ─► qrank (2-phase rank)
                              ├─► triples (lead-window edges, dedup)
                              └─► item_signals (signal-vector sums)

Stage boundaries in the reference are compressed files on S3; here they
are optional parquet checkpoints managed by plans.checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.linking import canonical_dictionary
from ..operators.links import triples
from ..operators.mentions import media_mentions, text_mentions
from ..operators.qrank import qrank, qviews
from ..operators.signals import item_signals
from ..sources.interleaved import dictionary, redirects, spans
from ..sources.tables import load_table


def build_graph(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Construct every output of the pipeline as lazy DataFrames."""
    documents = load_table(spark, sf_dir, "documents")
    sp = spans(documents)
    # persist the (tiny) dictionary: without it, Catalyst replicates the
    # dictionary subtree — corpus scan + distinct + rank window + the 8
    # redirect-resolution joins — once per broadcast use (9× per query,
    # observed in the physical plan). The cache is |vocab| rows.
    raw_dict = dictionary(documents).persist()
    red = redirects(raw_dict)
    cdict = canonical_dictionary(raw_dict, red).persist()

    tm = text_mentions(sp, cdict)
    mm = media_mentions(sp, cdict)

    qv = qviews(tm)
    return {
        "documents": documents,
        "spans": sp,
        "dictionary": raw_dict,
        "canonical_dictionary": cdict,
        "redirects": red,
        "text_mentions": tm,
        "media_mentions": mm,
        "qviews": qv,
        "qrank": qrank(qv),
        "triples": triples(tm),
        "item_signals": item_signals(tm, mm, documents, cdict),
    }


def run_full_build(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    version=None,
    code_version: str = "v1",
) -> dict:
    """The complete build a reference user would run: checkpointed KG
    pipeline → stats → published public artifacts (qrank CSV,
    item_signals CSV, stats JSON) with latest-artifact resolution.
    Re-running with fresh checkpoints skips every compute stage.

    Returns {'outputs': basename→path, 'metrics': per-stage metrics,
    'stats': the stats dict}.
    """
    from datetime import date

    from ..operators.stats import build_stats_distributed
    from .checkpoint import LINEAGE_PARTITION_COL, LINEAGE_SNAPSHOT_COL, build_checkpointed
    from .publish import publish

    g = build_checkpointed(spark, sf_dir, checkpoint_dir, code_version=code_version)
    qrank_df = g["qrank"].drop(LINEAGE_PARTITION_COL, LINEAGE_SNAPSHOT_COL)
    signals_df = g["item_signals"].drop(LINEAGE_PARTITION_COL, LINEAGE_SNAPSHOT_COL)
    # executor-side stats kernel (byte-identical to the driver form,
    # tests/test_full_build.py): at the production 27M-row qrank table
    # the toLocalIterator form streams every row through the driver
    stats = build_stats_distributed(qrank_df, top_n=50, num_samples=1000)
    outputs = publish(
        out_dir,
        version or date.today(),
        qrank_df=qrank_df,
        item_signals_df=signals_df,
        stats=stats,
    )
    return {"outputs": outputs, "metrics": g["manager"].metrics(), "stats": stats}
