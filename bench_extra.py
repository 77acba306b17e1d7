"""Round-6 auxiliary benchmarks (bench.py is frozen for measurement —
the driver times the round-start copy; everything exploratory lives
here). Modes:

* ``--stages [sf_dir]`` — per-stage attribution of the heavy bench
  queries (noop-sink isolation per the optimization guide §1.4, job
  descriptions per §1.5). Prints one JSON line per probe.
* ``--queries [sf_dir] [trials]`` — same queries and methodology as
  bench.py's per-query timing (count actions, min of N trials), so
  before/after comparisons use identical protocol without touching the
  frozen harness.
* ``--net-graph [sf_dir]`` — operator-net walls for the graph keys
  (VERDICT r5 item 6): materialize the mention-derived edge relation
  once (localCheckpoint), then time graph operators against it, so the
  ~constant dictionary/mention prologue stops aliasing into every
  graph wall.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, name, action, trials=1):
    walls = []
    for _ in range(trials):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        out = action()
        walls.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    rec = {"probe": name, "wall_sec": min(walls), "all_walls": walls}
    if isinstance(out, int):
        rec["rows"] = out
    print(json.dumps(rec), flush=True)
    return out


def stages_mode(sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators import dedup, similarity, textstats
    from wikidata_qrank_spark.operators.clusters import (
        connected_components,
        dup_clusters_scaled,
    )
    from wikidata_qrank_spark.operators.dedup import (
        _shingles,
        inject_near_dups,
        jaccard_prefix_candidates,
        jaccard_verify_candidates,
        minhash_band_table,
        minhash_lsh_pairs,
    )
    from wikidata_qrank_spark.operators.sketches import count_min
    from wikidata_qrank_spark.plans.training_data import corpus_prep
    from wikidata_qrank_spark.session import get_session
    from wikidata_qrank_spark.sources.tables import load_table

    spark = get_session("bench-extra-stages", cpus=CPUS)
    docs = load_table(spark, sf_dir, "documents")
    inj = inject_near_dups(docs)

    # ---- q13 decomposition
    sh = _shingles(inj, "text", 3)
    _timed(spark, "q13/shingles", lambda: sh.count())
    cand = jaccard_prefix_candidates(sh, 0.5).localCheckpoint(eager=False)
    n_cand = _timed(spark, "q13/candidates", lambda: cand.count())
    _timed(
        spark,
        "q13/verify",
        lambda: jaccard_verify_candidates(
            inj, cand, threshold=0.5, shingles=sh
        ).count(),
    )

    # ---- q7 decomposition
    _timed(
        spark,
        "q7/band_table",
        lambda: _noop(minhash_band_table(docs)),
    )
    _timed(spark, "q7/pairs", lambda: minhash_lsh_pairs(docs).count())

    # ---- q12 decomposition
    cand12 = minhash_lsh_pairs(inj).localCheckpoint(eager=False)
    _timed(spark, "q12/lsh_pairs", lambda: cand12.count())
    ver12 = jaccard_verify_candidates(inj, cand12, threshold=0.5).localCheckpoint(
        eager=False
    )
    _timed(spark, "q12/verify", lambda: ver12.count())
    _timed(spark, "q12/cc", lambda: connected_components(ver12).count())
    _timed(
        spark,
        "q12/end_to_end",
        lambda: dup_clusters_scaled(inj, threshold=0.5).count(),
    )

    # ---- q16 decomposition
    from wikidata_qrank_spark.operators.sampling import stratified_sample
    from wikidata_qrank_spark.operators.textstats import curate_corpus, token_counts

    comp = dup_clusters_scaled(inj, threshold=0.5, hash_family="xxhash64")
    victims = (
        comp.filter(F.col("doc_id") != F.col("component"))
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    _timed(spark, "q16/victims", lambda: victims.count())
    survivors = inj.join(victims, "doc_id", "left_anti")
    _timed(spark, "q16/curate", lambda: curate_corpus(survivors, min_quality=0.5).count())
    _timed(spark, "q16/token_counts", lambda: token_counts(survivors).count())
    _timed(
        spark,
        "q16/end_to_end",
        lambda: corpus_prep(spark, sf_dir, hash_family="xxhash64").count(),
    )

    # ---- q11 / q18 / q8 / q9
    bench_set = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    _timed(
        spark,
        "q11/contamination",
        lambda: dedup.ngram_contamination(train, bench_set, n=3, min_shared=2).count(),
        trials=2,
    )
    cm_toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    _timed(
        spark,
        "q18/countmin",
        lambda: count_min(cm_toks, "token", depth=4, width=256).count(),
        trials=2,
    )
    emb = load_table(spark, sf_dir, "embeddings")
    _timed(
        spark,
        "q8/ann_topk",
        lambda: similarity.brute_force_topk(emb, emb.limit(16), k=5).count(),
        trials=2,
    )
    _timed(spark, "q9/quality", lambda: textstats.quality_scores(docs).count(), trials=2)
    spark.stop()


def queries_mode(sf_dir: str, trials: int) -> None:
    """bench.py-equivalent per-query timing (same actions, min-of-N)."""
    os.environ["SPARK_GRAFT_QUERY_TRIALS"] = str(trials)
    import importlib

    import bench

    importlib.reload(bench)
    res = bench.run_queries(CPUS, sf_dir)
    print(
        json.dumps(
            {
                "metric": "bench_extra_queries",
                "value": res["total_sec"],
                "queries": res["queries"],
                "trial_walls": res["trial_walls"],
                "sf_dir": sf_dir,
                "trials": trials,
            }
        ),
        flush=True,
    )


def net_graph_mode(sf_dir: str) -> None:
    """Gross vs net walls for graph operators: net = against a
    localCheckpointed edge relation (prologue excluded)."""
    from wikidata_qrank_spark.operators.graph import (
        neighborhood_function,
        triangles,
    )
    from wikidata_qrank_spark.plans.pipeline import build_graph
    from wikidata_qrank_spark.session import get_session

    spark = get_session("bench-extra-netgraph", cpus=CPUS)
    g = build_graph(spark, sf_dir)
    edges_lazy = g["triples"].select("src_id", "dst_id")
    t0 = time.perf_counter()
    edges = edges_lazy.localCheckpoint(eager=True)
    prologue = round(time.perf_counter() - t0, 3)
    print(json.dumps({"probe": "net/prologue_edges", "wall_sec": prologue}), flush=True)
    _timed(spark, "net/triangles", lambda: triangles(edges).count(), trials=2)
    _timed(
        spark,
        "gross/triangles",
        lambda: triangles(edges_lazy).count(),
        trials=2,
    )
    _timed(
        spark,
        "net/neighborhood",
        lambda: neighborhood_function(edges, max_hops=4).count(),
        trials=2,
    )
    spark.stop()


def main() -> None:
    args = sys.argv[1:]
    if "--stages" in args:
        i = args.index("--stages")
        sf = args[i + 1] if len(args) > i + 1 else SF_DIR
        stages_mode(sf)
    elif "--queries" in args:
        i = args.index("--queries")
        sf = args[i + 1] if len(args) > i + 1 else SF_DIR
        trials = int(args[i + 2]) if len(args) > i + 2 else 3
        queries_mode(sf, trials)
    elif "--net-graph" in args:
        i = args.index("--net-graph")
        sf = args[i + 1] if len(args) > i + 1 else SF_DIR
        net_graph_mode(sf)
    else:
        print("usage: bench_extra.py --stages|--queries|--net-graph [sf_dir]")


if __name__ == "__main__":
    main()
