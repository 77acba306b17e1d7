"""Capture .explain('formatted') for the lazily-capturable COMPONENT
stages of the three bench queries whose whole-query plans cannot be
captured (q12/q16 contain an iterative connected-components loop, q17
an eager localCheckpoint — see scripts/capture_plans.py). The plan
claims OPTIMIZATION_r06.md makes about those queries are about exactly
these components:

  q12_verify_stage   — LSH candidates -> exact-Jaccard verification
                       (the array-based verify rewrite)
  q16_curate_stage   — curate_corpus: language_id aggregation barrier +
                       layered quality projections + broadcast joins
  q16_minhash_sketch — the md5 sketch aggregation (documented as NOT
                       yet optimized; its plan is the evidence for the
                       measured aggregation floor)

Usage (same convention as capture_plans.py):

    python scripts/capture_plans_components.py before|after [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_dir = os.environ.get(
        "PLAN_OUT_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r06",
        ),
    )
    os.makedirs(out_dir, exist_ok=True)

    from wikidata_qrank_spark.operators import dedup, textstats
    from wikidata_qrank_spark.session import get_session
    from wikidata_qrank_spark.sources.tables import load_table

    spark = get_session(
        "capture-plans-components",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    docs = load_table(spark, sf_dir, "documents")
    injected = dedup.inject_near_dups(docs)

    def frames():
        # q12 (dup_clusters_scaled) pre-CC stage, exactly as composed in
        # clusters.dup_clusters_scaled with the bench arguments
        cand = dedup.minhash_lsh_pairs(
            injected,
            "text",
            3,
            dedup.DEFAULT_BANDS,
            dedup.DEFAULT_ROWS_PER_BAND,
            "xxhash64",
        )
        yield "q12_verify_stage", dedup.jaccard_verify_candidates(
            injected, cand, "text", 3, 0.5
        )
        # q16 (corpus_prep) component stages
        yield "q16_curate_stage", textstats.curate_corpus(docs)
        yield "q16_minhash_sketch", dedup.minhash_signatures(
            docs, hash_family="md5"
        )

    for name, df in frames():
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # pragma: no cover - capture harness
            print(f"SKIP {name}: {exc}")
            continue
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
