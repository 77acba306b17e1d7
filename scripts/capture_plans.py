"""Capture .explain('formatted') output for every bench query into
plans/r06/<query>_<tag>.txt (judge deliverable: plan-shape evidence for
round-6 optimizations). Usage:

    python scripts/capture_plans.py before [sf_dir]
    python scripts/capture_plans.py after  [sf_dir]

Capture only — no query execution beyond the tiny probe_dim/first calls
some operators make while building their plans.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def bench_query_frames(spark, sf_dir):
    """The same DataFrames bench.py counts, name → DataFrame."""
    from wikidata_qrank_spark.operators import dedup, similarity, textstats
    from wikidata_qrank_spark.operators.clusters import dup_clusters_scaled
    from wikidata_qrank_spark.operators.graph import triangles
    from wikidata_qrank_spark.operators.sketches import count_min, hll_distinct
    from wikidata_qrank_spark.plans.pipeline import build_graph
    from wikidata_qrank_spark.plans.training_data import corpus_prep
    from wikidata_qrank_spark.sources.synthetic import zipf_documents
    from wikidata_qrank_spark.sources.tables import load_table

    g = build_graph(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    toks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.length("token") > 0)
    cm_toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    bench_set = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    zdocs = zipf_documents(spark, n_docs=4000, vocab_size=20_000, doc_len=30)
    return {
        "q1_qviews": g["qviews"],
        "q2_qrank": g["qrank"],
        "q3_triples": g["triples"],
        "q4_item_signals": g["item_signals"],
        "q5_text_mentions": g["text_mentions"],
        "q6_exact_dedup": dedup.exact_duplicate_groups(docs),
        "q7_minhash_pairs": dedup.minhash_lsh_pairs(docs),
        "q8_ann_topk": similarity.brute_force_topk(emb, emb.limit(16), k=5),
        "q9_quality": textstats.quality_scores(docs),
        "q10_pii_scrub": textstats.scrub_pii(textstats.inject_contact(docs)),
        "q11_contamination": dedup.ngram_contamination(
            train, bench_set, n=3, min_shared=2
        ),
        "q12_dup_clusters_lsh": None,  # iterative (CC) — plan not capturable lazily
        "q13_jaccard_prefix": dedup.jaccard_prefix_pairs(
            dedup.inject_near_dups(docs), n=3, threshold=0.5
        ),
        "q13z_jaccard_prefix_zipf": dedup.jaccard_prefix_pairs(
            dedup.inject_near_dups(zdocs, every=50), n=3, threshold=0.5
        ),
        "q14_hll_tokens": hll_distinct(toks, "token", ["lang"]),
        "q15_triangles": triangles(g["triples"].select("src_id", "dst_id")),
        "q16_pipeline": None,  # contains localCheckpoint + CC loop
        "q17_chunk_dedup": None,  # contains eager localCheckpoint
        "q18_countmin": count_min(cm_toks, "token", depth=4, width=256),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
    )
    os.makedirs(out_dir, exist_ok=True)

    from wikidata_qrank_spark.session import get_session

    spark = get_session("capture-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    frames = bench_query_frames(spark, sf_dir)
    for name, df in frames.items():
        if df is None:
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
