"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

--scaling: run the full KG build twice in subprocesses at two
parallelism levels (local[N] and local[4N]) on the identical input and
report docs/sec at both plus scaling efficiency — the sandbox stand-in
for the north rule's N vs 4N executor criterion (no real cluster here).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_label(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_queries(cpus: int, sf_dir: str) -> dict:
    from wikidata_qrank_spark.plans.pipeline import build_graph
    from wikidata_qrank_spark.session import get_session

    spark = get_session("bench", cpus=cpus)
    t_all0 = time.perf_counter()
    g = build_graph(spark, sf_dir)
    timings: dict[str, float] = {}
    n_docs = g["documents"].count()

    headline = {
        "q1_qviews": g["qviews"],
        "q2_qrank": g["qrank"],
        "q3_triples": g["triples"],
        "q4_item_signals": g["item_signals"],
        "q5_text_mentions": g["text_mentions"],
    }
    for name, df in headline.items():
        t0 = time.perf_counter()
        df.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    # extended ops, if present (kept optional so bench never breaks
    # while operators are being added)
    try:
        from wikidata_qrank_spark.operators import dedup, similarity, textstats
        from wikidata_qrank_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        emb = load_table(spark, sf_dir, "embeddings")
        extended = {
            "q6_exact_dedup": lambda: dedup.exact_duplicate_groups(docs).count(),
            "q7_minhash_pairs": lambda: dedup.minhash_lsh_pairs(docs).count(),
            "q8_ann_topk": lambda: similarity.brute_force_topk(
                emb, emb.limit(16), k=5
            ).count(),
            "q9_quality": lambda: textstats.quality_scores(docs).count(),
        }
        for name, action in extended.items():
            t0 = time.perf_counter()
            action()
            timings[name] = round(time.perf_counter() - t0, 3)
    except ImportError:
        pass

    total = round(time.perf_counter() - t_all0, 3)
    spark.stop()
    return {"total_sec": total, "queries": timings, "n_docs": n_docs}


def scaling_mode() -> None:
    n = max(2, CPUS // 4)
    results = {}
    for level in (n, CPUS):
        out = subprocess.run(
            [sys.executable, __file__, "--single", str(level)],
            capture_output=True,
            text=True,
            check=False,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[level] = json.loads(line)
    t_n, t_4n = results[n]["value"], results[CPUS]["value"]
    docs = results[CPUS]["n_docs"]
    tp_n, tp_4n = docs / t_n, docs / t_4n
    eff = (tp_4n / tp_n) / (CPUS / n)
    print(
        json.dumps(
            {
                "metric": "kg_build_scaling",
                "unit": "docs/sec",
                "n_cpus": n,
                "n4_cpus": CPUS,
                "docs": docs,
                "throughput_n": round(tp_n, 1),
                "throughput_4n": round(tp_4n, 1),
                "speedup": round(tp_4n / tp_n, 3),
                "scaling_efficiency": round(eff, 3),
                "sf": _sf_label(SF_DIR),
            }
        )
    )


def main() -> None:
    if "--scaling" in sys.argv:
        scaling_mode()
        return
    if "--single" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--single") + 1])
    else:
        cpus = CPUS
    res = run_queries(cpus, SF_DIR)
    print(
        json.dumps(
            {
                "metric": "kg_build_wall_sec",
                "value": res["total_sec"],
                "unit": "sec",
                "queries": res["queries"],
                "sf": _sf_label(SF_DIR),
                "n_docs": res["n_docs"],
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
