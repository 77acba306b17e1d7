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
SCALING_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_scaling.json")


def _sf_label(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


QUERY_TRIALS = int(os.environ.get("SPARK_GRAFT_QUERY_TRIALS", "3"))


def _timed_min(action, trials: int = QUERY_TRIALS) -> tuple[float, list[float]]:
    """(min, all walls) of N runs for one query action. This host has
    documented multi-10-second kernel stalls (see BENCH.md): a
    single-shot wall can double on unchanged code, so round-over-round
    diffs must use the minimum of several runs to measure the plan, not
    the hypervisor. The full per-trial list is emitted too, so a
    regressed key can be attributed (first-trial JIT/shuffle-file
    effects show as trial1 >> trial2 ≈ trial3; host weather shows as
    jitter across ALL trials)."""
    walls = []
    for _ in range(trials):
        t0 = time.perf_counter()
        action()
        walls.append(round(time.perf_counter() - t0, 3))
    return round(min(walls), 3), walls


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
    trial_walls: dict[str, list[float]] = {}
    for name, df in headline.items():
        timings[name], trial_walls[name] = _timed_min(df.count)

    # extended ops, if present (kept optional so bench never breaks
    # while operators are being added)
    try:
        from wikidata_qrank_spark.operators import dedup, similarity, textstats
        from wikidata_qrank_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        emb = load_table(spark, sf_dir, "embeddings")
        def _pii():
            return textstats.scrub_pii(textstats.inject_contact(docs)).count()

        def _contamination():
            from pyspark.sql import functions as F

            bench_set = docs.filter(F.col("doc_id") % 97 == 0)
            train = docs.filter(F.col("doc_id") % 97 != 0)
            return dedup.ngram_contamination(train, bench_set, n=3, min_shared=2).count()

        def _dup_clusters_lsh():
            # the composed scale pipeline (xxhash64 scale path) over the
            # near-dup-injected corpus: LSH -> verify-on-candidates -> CC
            from wikidata_qrank_spark.operators.clusters import dup_clusters_scaled

            return dup_clusters_scaled(
                dedup.inject_near_dups(docs), threshold=0.5
            ).count()

        def _jaccard_prefix():
            # exact similarity join on the prefix-filtered candidate set
            return dedup.jaccard_prefix_pairs(
                dedup.inject_near_dups(docs), n=3, threshold=0.5
            ).count()

        def _jaccard_prefix_zipf():
            # same operator as q13 on a Zipfian vocabulary — the
            # real-corpus regime the prefix filter is designed for; the
            # q13-vs-q13z gap measures how much of q13's wall is the
            # 24-word synthetic vocabulary's dense candidate set
            from wikidata_qrank_spark.sources.synthetic import zipf_documents

            zdocs = zipf_documents(
                spark, n_docs=4000, vocab_size=20_000, doc_len=30
            )
            return dedup.jaccard_prefix_pairs(
                dedup.inject_near_dups(zdocs, every=50),
                n=3,
                threshold=0.5,
            ).count()

        def _hll_tokens():
            from pyspark.sql import functions as F

            from wikidata_qrank_spark.operators.sketches import hll_distinct

            toks = docs.select(
                "lang", F.explode(F.split("text", " ")).alias("token")
            ).filter(F.length("token") > 0)
            return hll_distinct(toks, "token", ["lang"]).count()

        def _triangles():
            from wikidata_qrank_spark.operators.graph import triangles

            return triangles(g["triples"].select("src_id", "dst_id")).count()

        def _pipeline():
            from wikidata_qrank_spark.plans.training_data import corpus_prep

            return corpus_prep(spark, sf_dir).count()

        def _countmin():
            from pyspark.sql import functions as F

            from wikidata_qrank_spark.operators.sketches import count_min

            toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
            return count_min(toks, "token", depth=4, width=256).count()

        extended = {
            "q6_exact_dedup": lambda: dedup.exact_duplicate_groups(docs).count(),
            "q7_minhash_pairs": lambda: dedup.minhash_lsh_pairs(docs).count(),
            "q8_ann_topk": lambda: similarity.brute_force_topk(
                emb, emb.limit(16), k=5
            ).count(),
            "q9_quality": lambda: textstats.quality_scores(docs).count(),
            # round-2 additions (q1–q9 keys stay stable for diffing)
            "q10_pii_scrub": _pii,
            "q11_contamination": _contamination,
            # round-3 addition: the end-to-end scale dedup composition
            "q12_dup_clusters_lsh": _dup_clusters_lsh,
            # round-3 late additions: exact-join scale path, portable
            # HLL, degree-ordered triangles
            "q13_jaccard_prefix": _jaccard_prefix,
            # round-4: q13 on a Zipf vocabulary (selectivity evidence)
            "q13z_jaccard_prefix_zipf": _jaccard_prefix_zipf,
            "q14_hll_tokens": _hll_tokens,
            "q15_triangles": _triangles,
            # the composed corpus-prep capstone
            "q16_pipeline": _pipeline,
            # round-5: sub-document dedup + mergeable CM sketch
            "q17_chunk_dedup": lambda: dedup.chunk_dedup(docs).count(),
            "q18_countmin": _countmin,
        }
        for name, action in extended.items():
            timings[name], trial_walls[name] = _timed_min(action)
    except ImportError:
        pass

    # total = sum of per-query minimums (comparable round over round);
    # wall_sec = everything including the warmup repetitions
    total = round(sum(timings.values()), 3)
    wall = round(time.perf_counter() - t_all0, 3)
    spark.stop()
    return {
        "total_sec": total,
        "wall_sec": wall,
        "queries": timings,
        "trial_walls": trial_walls,
        "n_docs": n_docs,
    }


BENCH_REPL = int(os.environ.get("SPARK_GRAFT_BENCH_REPL", "720"))
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))


def _corpus_dir() -> str:
    root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    import tempfile

    return os.path.join(tempfile.mkdtemp(dir=root, prefix="kgbench_"), "corpus")


def materialize_corpus(sf_dir: str, repl: int, out: str) -> int:
    """Write the deterministic replicated corpus once; both parallelism
    levels then read the identical parquet input (the north rule's
    'same job, same input, two cluster sizes')."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.session import get_session
    from wikidata_qrank_spark.sources.tables import load_table

    spark = get_session("bench-setup", cpus=CPUS)
    base = load_table(spark, sf_dir, "documents").repartition(96)
    docs = (
        base.select(
            "doc_id",
            "text",
            "n_chars",
            F.explode(F.sequence(F.lit(0), F.lit(repl - 1))).alias("__r"),
        )
        .withColumn(
            "doc_id",
            F.concat_ws("-", F.col("doc_id").cast("string"), F.col("__r").cast("string")),
        )
        .drop("__r")
    )
    docs.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    spark.stop()
    return n


def run_scaled_build(cpus: int, corpus_dir: str, sf_dir: str, trials: int = 3) -> dict:
    """One KG build (fused Arrow kernel: mention detection + view
    partials + adjacency edges in a single text pass, then one combining
    shuffle) over the materialized corpus. Warmed JVM, min-of-trials.

    The process is pinned to ``cpus`` CPUs by the parent (sched
    affinity), so GC/JIT/netty threads can't borrow extra cores and
    deflate the low-parallelism measurement.
    """
    import time as _time

    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.fused import (
        combine_partials,
        kg_partials,
        kg_partials_vectorized,
        qviews_from_combined,
        triples_from_combined,
    )

    # A/B switch for the fused kernel's inner shape (BENCH.md records
    # both; the partials schema and downstream finishes are shared)
    partials_fn = (
        kg_partials_vectorized
        if os.environ.get("SPARK_GRAFT_FUSED_IMPL", "loop") == "vector"
        else kg_partials
    )
    from wikidata_qrank_spark.operators.linking import canonical_dictionary
    from wikidata_qrank_spark.session import get_session
    from wikidata_qrank_spark.sources.interleaved import dictionary, redirects
    from wikidata_qrank_spark.sources.tables import load_table

    spark = get_session(
        f"bench-scale-{cpus}",
        cpus=cpus,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.sql.shuffle.partitions": str(cpus * 2),
            "spark.sql.files.maxPartitionBytes": "131072",
            "spark.sql.files.openCostInBytes": "131072",
            **(
                {"spark.local.dir": "/dev/shm/spark-local"}
                if os.path.isdir("/dev/shm")
                else {}
            ),
        },
    )
    corpus = spark.read.parquet(corpus_dir)
    small = load_table(spark, sf_dir, "documents")
    d = dictionary(small)
    cdict = canonical_dictionary(d, redirects(d)).cache()
    cdict.count()

    def job(df):
        t0 = _time.perf_counter()
        combined = combine_partials(partials_fn(df, cdict))
        qchk = qviews_from_combined(combined).select(
            F.bit_xor(F.xxhash64("item_id", "views")).alias("chk")
        )
        tchk = triples_from_combined(combined).select(
            F.bit_xor(F.xxhash64("subj", "pred", "obj")).alias("chk")
        )
        qchk.unionAll(tchk).collect()
        return _time.perf_counter() - t0

    job(corpus.limit(20000))
    job(corpus.limit(100000))
    walls = [job(corpus) for _ in range(trials)]
    n = corpus.count()
    spark.stop()
    return {"wall_sec": round(min(walls), 3), "all_walls": [round(w, 3) for w in walls],
            "n_docs": n, "cpus": cpus}


DEDUP_REPL = int(os.environ.get("SPARK_GRAFT_DEDUP_REPL", "100"))


def materialize_dedup_corpus(sf_dir: str, repl: int, out: str) -> int:
    """Corpus for the dedup-scaling measurement: each replica gets its
    own token vocabulary (every token suffixed with the replica id), so
    cross-replica similarity is ZERO and duplicate density stays the
    injected ~2% — replicating text verbatim would make every doc a
    near-dup of its copies and the banded join quadratic in the
    replication factor, which benchmarks the corpus, not the plan."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.session import get_session
    from wikidata_qrank_spark.sources.tables import load_table

    spark = get_session("dedup-bench-setup", cpus=CPUS)
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    docs = (
        base.select(
            "doc_id",
            toks.alias("toks"),
            F.explode(F.sequence(F.lit(0), F.lit(repl - 1))).alias("r"),
        )
        .select(
            (F.col("doc_id") * repl + F.col("r")).alias("doc_id"),
            F.array_join(
                F.transform(
                    "toks",
                    lambda t: F.concat(t, F.lit("_"), F.col("r").cast("string")),
                ),
                " ",
            ).alias("text"),
        )
        .repartition(96)
    )
    docs.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    spark.stop()
    return n


def materialize_capstone_corpus(sf_dir: str, repl: int, out: str) -> int:
    """Replicated corpus for the capstone (q16) measurements: same
    vocab-disjoint replication as the dedup corpus (cross-replica
    Jaccard ≈ 0, so the banded join stays linear in the replication
    factor) EXCEPT that language-marker tokens keep their surface form —
    otherwise language ID reads 'und' everywhere, curation keeps zero
    docs, and AQE elides the downstream token-accounting stages the A/B
    is supposed to measure. Marker-trigram collisions across replicas
    are rare and handled by minhash like any other hot shingle."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.textstats import LANG_MARKERS
    from wikidata_qrank_spark.session import get_session
    from wikidata_qrank_spark.sources.tables import load_table

    markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    spark = get_session("capstone-bench-setup", cpus=CPUS)
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    marker_arr = F.array(*[F.lit(m) for m in markers])
    docs = (
        base.select(
            "doc_id",
            toks.alias("toks"),
            F.explode(F.sequence(F.lit(0), F.lit(repl - 1))).alias("r"),
        )
        .select(
            (F.col("doc_id") * repl + F.col("r")).alias("doc_id"),
            F.array_join(
                F.transform(
                    "toks",
                    lambda t: F.when(
                        F.array_contains(marker_arr, t), t
                    ).otherwise(
                        F.concat(t, F.lit("_"), F.col("r").cast("string"))
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .repartition(96)
    )
    docs.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    spark.stop()
    return n


def run_scaled_dedup(cpus: int, corpus_dir: str, trials: int = 2) -> dict:
    """The scale dedup pipeline (xxhash64 minhash LSH → exact verify on
    candidates → connected components) over the materialized corpus at
    one pinned parallelism level; min-of-trials, warmed JVM."""
    import time as _time

    from wikidata_qrank_spark.operators.clusters import dup_clusters_scaled
    from wikidata_qrank_spark.operators.dedup import inject_near_dups
    from wikidata_qrank_spark.session import get_session

    spark = get_session(
        f"dedup-scale-{cpus}",
        cpus=cpus,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.sql.shuffle.partitions": str(cpus * 2),
            **(
                {"spark.local.dir": "/dev/shm/spark-local"}
                if os.path.isdir("/dev/shm")
                else {}
            ),
        },
    )
    corpus = spark.read.parquet(corpus_dir)

    def job(df):
        t0 = _time.perf_counter()
        dup_clusters_scaled(inject_near_dups(df), threshold=0.5).count()
        return _time.perf_counter() - t0

    job(corpus.limit(5000))
    walls = [job(corpus) for _ in range(trials)]
    n = corpus.count()
    spark.stop()
    return {
        "wall_sec": round(min(walls), 3),
        "all_walls": [round(w, 3) for w in walls],
        "n_docs": n,
        "cpus": cpus,
    }


def _run_dedup_level_pinned(cpus: int, corpus_dir: str) -> dict:
    code = (
        "import os, sys, json; os.sched_setaffinity(0, set(range({c})));"
        "sys.path.insert(0, {root!r});"
        "import bench; r = bench.run_scaled_dedup({c}, {corpus!r});"
        "print('LEVEL ' + json.dumps(r))"
    ).format(
        c=cpus,
        root=os.path.dirname(os.path.abspath(__file__)),
        corpus=corpus_dir,
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=False
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEVEL "):
            return json.loads(line[6:])
    raise RuntimeError(f"dedup level {cpus} failed: {out.stderr[-2000:]}")


def scaling_dedup_mode() -> None:
    import shutil

    n = SCALE_N
    n4 = n * 4
    corpus_dir = _corpus_dir()
    docs = materialize_dedup_corpus(SF_DIR, DEDUP_REPL, corpus_dir)
    try:
        r_n = _run_dedup_level_pinned(n, corpus_dir)
        r_4n = _run_dedup_level_pinned(n4, corpus_dir)
    finally:
        shutil.rmtree(os.path.dirname(corpus_dir), ignore_errors=True)
    tp_n = docs / r_n["wall_sec"]
    tp_4n = docs / r_4n["wall_sec"]
    print(
        json.dumps(
            {
                "metric": "dedup_pipeline_scaling",
                "unit": "docs/sec",
                "n_cpus": n,
                "n4_cpus": n4,
                "docs": docs,
                "wall_n_sec": r_n["wall_sec"],
                "wall_4n_sec": r_4n["wall_sec"],
                "all_walls_n": r_n["all_walls"],
                "all_walls_4n": r_4n["all_walls"],
                "throughput_n": round(tp_n, 1),
                "throughput_4n": round(tp_4n, 1),
                "speedup": round(tp_4n / tp_n, 3),
                "scaling_efficiency": round((tp_4n / tp_n) / (n4 / n), 3),
                "sf": _sf_label(SF_DIR),
                "replication": DEDUP_REPL,
            }
        )
    )


def ab_capstone_mode() -> None:
    """A/B/C for the corpus-prep capstone's materialization strategy
    (round-4 judge item #2): same replicated marker-preserving corpus,
    same session — 'lazy' (victim lineage embedded in both consumers,
    sketch stages run twice, text re-derived per stage) vs
    'checkpoint_ids' (KB-scale victim id-list localCheckpoint, single
    sketch pass, text still re-scanned from parquet) vs 'cache_text'
    (checkpoint_ids + persist() of the injected corpus). Min-of-2
    each, interleaved order to cancel warmup drift. The winner is the
    corpus_prep default; the td_pipeline oracle is strategy-blind."""
    import shutil
    import time as _time

    from wikidata_qrank_spark.plans.training_data import corpus_prep
    from wikidata_qrank_spark.session import get_session

    repl = int(os.environ.get("SPARK_GRAFT_AB_REPL", str(DEDUP_REPL)))
    corpus_dir = _corpus_dir()
    docs = materialize_capstone_corpus(SF_DIR, repl, corpus_dir)
    spark = get_session(
        "ab-capstone",
        cpus=CPUS,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.sql.shuffle.partitions": str(CPUS * 2),
            **(
                {"spark.local.dir": "/dev/shm/spark-local"}
                if os.path.isdir("/dev/shm")
                else {}
            ),
        },
    )
    try:
        corpus = spark.read.parquet(corpus_dir)

        def run(strategy: str):
            t0 = _time.perf_counter()
            df = corpus_prep(
                spark,
                SF_DIR,
                documents=corpus,
                hash_family="xxhash64",
                strategy=strategy,
            )
            n = df.count()
            wall = _time.perf_counter() - t0
            spark.catalog.clearCache()
            return wall, n

        strategies = ("lazy", "checkpoint_ids", "cache_text")
        run("checkpoint_ids")  # warm JVM/readers once, result discarded
        walls = {s: [] for s in strategies}
        n_out = None
        for _ in range(2):
            for s in strategies:
                w, n_out = run(s)
                walls[s].append(round(w, 3))
        best = {s: min(w) for s, w in walls.items()}
        result = {
            "metric": "capstone_text_reuse_ab",
            "unit": "sec",
            "docs": docs,
            "rows_out": n_out,
            "wall_sec": best,
            "all_walls": walls,
            "winner": min(best, key=best.get),
            "replication": repl,
            "cpus": CPUS,
        }
        print(json.dumps(result))
    finally:
        spark.stop()
        shutil.rmtree(os.path.dirname(corpus_dir), ignore_errors=True)


def scale_regime_mode() -> None:
    """Scale-regime evidence for the round-3 walls (judge item #3): the
    q12/q15/q16 sf0.1 numbers are dominated by fixed stage-scheduling
    latency, so walls must grow SUB-linearly with input size. Runs each
    heavy key at 1x / ~10x / ~100x input and prints wall + throughput
    per level; throughput rising with size confirms the attribution."""
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.clusters import dup_clusters_scaled
    from wikidata_qrank_spark.operators.dedup import inject_near_dups
    from wikidata_qrank_spark.operators.graph import triangles
    from wikidata_qrank_spark.plans.training_data import corpus_prep
    from wikidata_qrank_spark.session import get_session
    from wikidata_qrank_spark.sources.tables import load_table

    corpus_root = _corpus_dir()
    dirs = {}
    for repl in (10, 100):
        d = f"{corpus_root}_x{repl}"
        materialize_capstone_corpus(SF_DIR, repl, d)
        dirs[repl] = d
    spark = get_session(
        "scale-regime",
        cpus=CPUS,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.sql.shuffle.partitions": str(CPUS * 2),
            **(
                {"spark.local.dir": "/dev/shm/spark-local"}
                if os.path.isdir("/dev/shm")
                else {}
            ),
        },
    )
    out: dict[str, list] = {"q12_dup_clusters": [], "q16_pipeline": [], "q15_triangles": []}
    try:
        base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        levels = [("1x", base)] + [
            (f"{r}x", spark.read.parquet(d)) for r, d in sorted(dirs.items())
        ]

        def timed(action, trials=2):
            walls = []
            for _ in range(trials):
                t0 = _time.perf_counter()
                action()
                walls.append(_time.perf_counter() - t0)
            return round(min(walls), 3)

        # warmup on the smallest level
        dup_clusters_scaled(inject_near_dups(base), threshold=0.5).count()
        for label, docs in levels:
            n = docs.count()
            w12 = timed(
                lambda d=docs: dup_clusters_scaled(
                    inject_near_dups(d), threshold=0.5
                ).count()
            )
            w16 = timed(
                lambda d=docs: corpus_prep(
                    spark, SF_DIR, documents=d, hash_family="xxhash64"
                ).count()
            )
            out["q12_dup_clusters"].append(
                {"level": label, "docs": n, "wall_sec": w12,
                 "docs_per_sec": round(n / w12, 1)}
            )
            out["q16_pipeline"].append(
                {"level": label, "docs": n, "wall_sec": w16,
                 "docs_per_sec": round(n / w16, 1)}
            )
            spark.catalog.clearCache()

        # q15: synthetic deterministic graphs (the sf0.1 KG graph has
        # 342 edges — pure overhead; these scale |E| by 300x / 3000x).
        # ~10 out-edges per node via hash, self-loops dropped.
        def graph_of(n_nodes: int):
            return (
                spark.range(n_nodes * 10)
                .select(
                    (F.col("id") % n_nodes).alias("src_id"),
                    F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("dst_id"),
                )
                .filter(F.col("src_id") != F.col("dst_id"))
            )

        triangles(graph_of(1_000)).count()  # warmup
        for label, n_nodes in [("1k", 1_000), ("10k", 10_000), ("100k", 100_000)]:
            g = graph_of(n_nodes)
            n_edges = g.count()
            w = timed(lambda g=g: triangles(g).count())
            out["q15_triangles"].append(
                {"level": label, "edges": n_edges, "wall_sec": w,
                 "edges_per_sec": round(n_edges / w, 1)}
            )
        print(json.dumps({"metric": "scale_regime", "results": out, "cpus": CPUS}))
    finally:
        spark.stop()
        shutil.rmtree(os.path.dirname(corpus_root), ignore_errors=True)


def cpu_control(cpus: int) -> float:
    """Pure-CPU control job (range scan + xxhash + bit_xor, no shuffle,
    no IO): measures how well ANY cpu-bound Spark job can scale at this
    width on this host. Reported alongside the pipeline numbers so
    hardware ceilings are distinguishable from plan defects."""
    import time as _time

    from pyspark.sql import functions as F

    from wikidata_qrank_spark.session import get_session

    spark = get_session(f"control-{cpus}", cpus=cpus)
    job = lambda n: spark.range(0, n, 1, cpus * 2).select(
        F.bit_xor(F.xxhash64(F.col("id"), F.col("id") + 1, F.col("id") * 3))
    ).collect()
    job(10**7)
    walls = []
    for _ in range(3):
        t0 = _time.perf_counter()
        job(2 * 10**9)
        walls.append(_time.perf_counter() - t0)
    spark.stop()
    return min(walls)


def _run_level_pinned(cpus: int, corpus_dir: str) -> dict:
    """Subprocess pinned to `cpus` CPUs running one level."""
    code = (
        "import os, sys, json; os.sched_setaffinity(0, set(range({c})));"
        "sys.path.insert(0, {root!r});"
        "import bench; r = bench.run_scaled_build({c}, {corpus!r}, {sf!r});"
        "r['control_wall_sec'] = round(bench.cpu_control({c}), 3);"
        "print('LEVEL ' + json.dumps(r))"
    ).format(c=cpus, root=os.path.dirname(os.path.abspath(__file__)),
             corpus=corpus_dir, sf=SF_DIR)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=False
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEVEL "):
            return json.loads(line[6:])
    raise RuntimeError(f"level {cpus} failed: {out.stderr[-2000:]}")


def scaling_mode() -> None:
    import shutil

    n = SCALE_N
    n4 = n * 4
    corpus_dir = _corpus_dir()
    docs = materialize_corpus(SF_DIR, BENCH_REPL, corpus_dir)
    try:
        r_n = _run_level_pinned(n, corpus_dir)
        r_4n = _run_level_pinned(n4, corpus_dir)
    finally:
        shutil.rmtree(os.path.dirname(corpus_dir), ignore_errors=True)
    tp_n = docs / r_n["wall_sec"]
    tp_4n = docs / r_4n["wall_sec"]
    eff = (tp_4n / tp_n) / (n4 / n)
    ctrl_eff = (r_n["control_wall_sec"] / r_4n["control_wall_sec"]) / (n4 / n)
    result = (
        json.dumps(
            {
                "metric": "kg_build_scaling",
                "unit": "docs/sec",
                "n_cpus": n,
                "n4_cpus": n4,
                "docs": docs,
                "wall_n_sec": r_n["wall_sec"],
                "wall_4n_sec": r_4n["wall_sec"],
                "all_walls_n": r_n["all_walls"],
                "all_walls_4n": r_4n["all_walls"],
                "throughput_n": round(tp_n, 1),
                "throughput_4n": round(tp_4n, 1),
                "speedup": round(tp_4n / tp_n, 3),
                "scaling_efficiency": round(eff, 3),
                "control_wall_n_sec": r_n["control_wall_sec"],
                "control_wall_4n_sec": r_4n["control_wall_sec"],
                "control_efficiency": round(ctrl_eff, 3),
                "sf": _sf_label(SF_DIR),
                "replication": BENCH_REPL,
            }
        )
    )
    with open(SCALING_CACHE, "w") as f:
        f.write(result)
    print(result)


def main() -> None:
    if "--scaling-dedup" in sys.argv:
        scaling_dedup_mode()
        return
    if "--scaling" in sys.argv:
        scaling_mode()
        return
    if "--ab-capstone" in sys.argv:
        ab_capstone_mode()
        return
    if "--scale-regime" in sys.argv:
        scale_regime_mode()
        return
    if "--single" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--single") + 1])
    else:
        cpus = CPUS
    res = run_queries(cpus, SF_DIR)
    payload = {
        "metric": "kg_build_wall_sec",
        "value": res["total_sec"],
        "unit": "sec",
        "queries": res["queries"],
        "trial_walls": res["trial_walls"],
        "query_trials": QUERY_TRIALS,
        "wall_sec_incl_warmup": res["wall_sec"],
        "sf": _sf_label(SF_DIR),
        "n_docs": res["n_docs"],
        "cpus": cpus,
    }
    # attach the most recent --scaling measurement (bench.py --scaling
    # writes it; see BENCH.md for methodology)
    try:
        with open(SCALING_CACHE) as f:
            payload["scaling"] = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
