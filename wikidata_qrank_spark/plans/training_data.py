"""The composed training-data preparation pipeline — the capstone that
turns the individually-verified operators into the actual corpus-prep
architecture a 100 TB pretraining run needs:

    raw corpus
      → near-dup removal at scale (md5 minhash LSH → exact Jaccard on
        candidates only → connected components → keep representatives)
      → curation (exact-dedup survivors ∩ quality ∩ confident lang-id)
      → deterministic stratified sampling by DETECTED language
      → token accounting

Every stage is an existing oracle-verified operator; the gate query
`td_pipeline` verifies the whole composition against one nested DuckDB
oracle, so stage-boundary bugs (wrong order, wrong survivor set, lost
columns) can't hide between individually-green pieces. Document text
never shuffles anywhere: near-dup detection moves sketches, curation
moves (doc_id, score) rows, sampling is a map-side predicate.

Runs over the near-dup-injected corpus (deterministic, oracle-mirrored)
because the synthetic corpus has no organic near-dups — same rationale
as td_dup_clusters_lsh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def corpus_prep(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    min_quality: float = 0.5,
    rates_permille: dict[str, int] | None = None,
    default_permille: int = 100,
    documents: DataFrame | None = None,
    hash_family: str = "md5",
    strategy: str = "checkpoint_ids",
) -> DataFrame:
    """(doc_id, predicted_lang, quality, ws_tokens) for the documents
    that survive the full prep pipeline.

    ``documents`` overrides the table read (benchmarking on a
    replicated corpus); ``hash_family`` picks the minhash kernel
    (md5 = oracle-portable, xxhash64 = scale path).

    ``strategy`` — how much intermediate state to materialize (A/B'd at
    500k docs, BENCH.md round 4; all three produce identical results
    and the oracle is strategy-blind):

    * ``'checkpoint_ids'`` (default): localCheckpoint the KB-scale
      victim doc_id list only. The LSH→verify→CC sketch work runs
      ONCE; document text is re-read map-side from columnar parquet by
      the curation and token-accounting stages — re-scanning is cheap,
      re-sketching is not.
    * ``'lazy'``: fully lazy plan; the victim lineage is embedded in
      both consumers, so the sketch stages run twice and the text ~4
      linear passes.
    * ``'cache_text'``: checkpoint_ids + persist() the injected corpus.
      Measured 2.4x SLOWER than lazy at 500k docs — row-cache
      materialization of full text costs more than every re-scan it
      saves; kept as the documented anti-pattern measurement."""
    from ..operators.clusters import dup_clusters_scaled
    from ..operators.dedup import inject_near_dups
    from ..operators.sampling import stratified_sample
    from ..operators.textstats import curate_corpus, token_counts
    from ..sources.tables import load_table

    rates = rates_permille if rates_permille is not None else {"en": 500, "zh": 250}

    if strategy not in ("checkpoint_ids", "lazy", "cache_text"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if documents is None:
        documents = load_table(spark, sf_dir, "documents")
    corpus = inject_near_dups(documents)
    if strategy == "cache_text":
        corpus = corpus.persist()
    comp = dup_clusters_scaled(corpus, threshold=threshold, hash_family=hash_family)
    victims = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    if strategy != "lazy":
        # KB-scale id list: cut the LSH/CC lineage here so neither
        # downstream consumer re-runs the sketch stages
        victims = victims.localCheckpoint(eager=True)
    survivors = corpus.join(victims, "doc_id", "left_anti")

    curated = curate_corpus(survivors, min_quality=min_quality)
    sampled = stratified_sample(
        curated,
        stratum_col="predicted_lang",
        id_col="doc_id",
        rates_permille=rates,
        default_permille=default_permille,
    )
    tc = token_counts(survivors).select("doc_id", "ws_tokens")
    return sampled.join(tc, "doc_id").select(
        "doc_id", "predicted_lang", "quality", "ws_tokens"
    )
