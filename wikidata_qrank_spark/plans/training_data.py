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
    reuse_text: bool = True,
) -> DataFrame:
    """(doc_id, predicted_lang, quality, ws_tokens) for the documents
    that survive the full prep pipeline.

    ``documents`` overrides the table read (benchmarking on a
    replicated corpus); ``hash_family`` picks the minhash kernel
    (md5 = oracle-portable, xxhash64 = scale path).

    ``reuse_text`` (default, the measured winner — BENCH.md round 4
    A/B) checkpoints the KB-scale victim doc_id list and persists the
    injected corpus, so the LSH→verify→CC sketch work runs ONCE and the
    text read is served from the columnar cache for the curation and
    token-accounting stages. With ``reuse_text=False`` the plan is
    fully lazy: the victim lineage is embedded in both consumers, which
    re-derives the text map-side per stage (~4 linear corpus passes) —
    the right call only where caching 100 TB is impossible AND the
    victim list can't be materialized (it is KB-scale, so it always
    can; kept for the A/B)."""
    from ..operators.clusters import dup_clusters_scaled
    from ..operators.dedup import inject_near_dups
    from ..operators.sampling import stratified_sample
    from ..operators.textstats import curate_corpus, token_counts
    from ..sources.tables import load_table

    rates = rates_permille if rates_permille is not None else {"en": 500, "zh": 250}

    if documents is None:
        documents = load_table(spark, sf_dir, "documents")
    corpus = inject_near_dups(documents)
    if reuse_text:
        corpus = corpus.persist()
    comp = dup_clusters_scaled(corpus, threshold=threshold, hash_family=hash_family)
    victims = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    if reuse_text:
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
