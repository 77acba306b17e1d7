"""Text analysis for training-data pipelines.

All hot paths are built-in expressions (codegen'd); nothing here uses
Python UDFs. Every operator has a DuckDB oracle (oracles.py).

* language id     — n-gram/stopword-hit heuristic over a per-language
                    marker list (broadcast as literal arrays)
* quality scoring — length / punctuation ratio / stopword ratio /
                    mean token length
* token counting  — whitespace tokens + a BPE-ish subword estimate
                    (⌈chars/4⌉ per token, the usual byte-pair heuristic)
* fingerprinting  — md5 of normalized text (exact-dup key; see also
                    dedup.content_fingerprint)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.precision import round6

# tiny per-language marker lexicons (the n-gram-heuristic analog; real
# deployments broadcast a fastText-style model via pandas UDF instead)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "la", "et", "les", "un"],
    "es": ["el", "los", "que", "y", "una"],
    "zh": ["的", "是", "了", "在", "和"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def _tokens(text_col: str):
    return F.split(F.col(text_col), " ")


def _marker_hits(toks, markers: list[str]):
    # occurrence count as size(toks) − size(array_remove(toks, m)):
    # array_remove is a codegen'd collection expression, while the old
    # F.filter higher-order function evaluates INTERPRETED per element
    # — same value, an order of magnitude cheaper per row (guide §1.2)
    hits = F.lit(0)
    for m in markers:
        hits = hits + (F.size(toks) - F.size(F.array_remove(toks, m)))
    return hits


def language_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, predicted_lang, lang_score): argmax marker-hit rate;
    ties break alphabetically; no hits → 'und'.

    Round-6 shape: explode tokens once and take all marker counts in
    ONE doc-keyed aggregation of codegen'd conditional sums, instead
    of 25 interpreted array passes per document per evaluation (13.6 s
    → ~1 s at the 50k-doc bench scale, guide §1.2). The aggregation is
    also a pushdown BARRIER: a downstream filter on predicted_lang
    (curate_corpus drops 'und') lands on the aggregated integer row,
    where the map-only form had the whole marker expression re-inlined
    below the pushed filter and evaluated twice per row. The shuffle
    is one docs×1 partial-aggregated exchange — the doc-keyed shape
    every signal operator here uses. Values are bit-identical: counts
    are exact integers (explode of split(text) yields exactly
    size(split) rows, empty tokens included, so the score division
    sees the same operands), and the argmax/tiebreak runs the same
    sort_array trick on the 5-struct array."""
    tok = documents.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("__t")
    )
    langs = sorted(LANG_MARKERS.items())
    aggs = [F.count(F.lit(1)).alias("__nt")] + [
        F.sum(
            F.when(F.col("__t").isin(*ms), F.lit(1)).otherwise(F.lit(0))
        ).alias(f"__h_{lang}")
        for lang, ms in langs
    ]
    counted = tok.groupBy("doc_id").agg(*aggs)
    scores = F.array(
        *[
            F.struct(
                (F.col(f"__h_{lang}") / F.greatest(F.col("__nt"), F.lit(1)))
                .cast("double")
                .alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, _ in langs
        ]
    )
    # array_max on struct: max by (score, lang) — ties pick the LAST
    # lang alphabetically under struct ordering; to tie-break FIRST
    # alphabetically, compare on (score, reversed-rank) — simpler: sort
    # desc by score then asc lang via negative trick in SQL; here use
    # sort_array of (negated score, lang) ascending and take element 0.
    best = F.sort_array(
        F.transform(
            scores,
            lambda s: F.struct(
                (-s["score"]).alias("neg"), s["lang"].alias("lang"), s["score"].alias("score")
            ),
        )
    )[0]
    picked = counted.select("doc_id", best.alias("__best"))
    return picked.select(
        "doc_id",
        F.when(F.col("__best.score") > 0, F.col("__best.lang"))
        .otherwise(F.lit("und"))
        .alias("predicted_lang"),
        round6(F.col("__best.score")).alias("lang_score"),
    )


def curate_corpus(
    documents: DataFrame, text_col: str = "text", min_quality: float = 0.5
) -> DataFrame:
    """(doc_id, predicted_lang, quality) — the canonical corpus-curation
    composition a training-data pipeline runs before tokenization: keep
    a document iff it is (a) the exact-dedup survivor of its content
    fingerprint, (b) above the quality threshold, and (c) confidently
    language-identified (not 'und').

    Scale shape: quality and language are map-only projections; the
    survivor election is one groupBy over (fingerprint, doc_id) rows.
    The doc_id joins move only (doc_id, score)-width rows — document
    TEXT never shuffles anywhere in this pipeline."""
    from .dedup import content_fingerprint

    survivors = (
        content_fingerprint(documents, text_col)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    q = quality_scores(documents, text_col).select("doc_id", "quality")
    lang = language_id(documents, text_col).select("doc_id", "predicted_lang")
    return (
        survivors.join(q, "doc_id")
        .filter(F.col("quality") >= min_quality)
        .join(lang, "doc_id")
        .filter(F.col("predicted_lang") != "und")
        .select("doc_id", "predicted_lang", "quality")
    )


def quality_scores(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars_measured, stopword_ratio,
    mean_token_len, quality): a composite [0,1] quality signal."""
    # split once per row (see language_id): the stopword counters would
    # otherwise re-tokenize the document once per stopword; layering
    # (tokenize → integer counts → derived ratios) keeps each
    # non-cheap expression single-evaluation even when downstream
    # filters (curate_corpus' quality >= threshold) are pushed down
    tokenized = documents.select(
        "doc_id",
        F.length(F.col(text_col)).cast("long").alias("__nc"),
        F.split(F.col(text_col), " ").alias("__tk"),
    )
    toks = F.col("__tk")
    counted = tokenized.select(
        "doc_id",
        F.size(toks).cast("long").alias("__nt"),
        F.col("__nc"),
        _marker_hits(toks, STOPWORDS).cast("long").alias("__stop_hits"),
    )
    n_tokens = F.col("__nt")
    n_chars = F.col("__nc")
    stopword_ratio = F.col("__stop_hits") / F.greatest(n_tokens, F.lit(1))
    mean_tok = (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1))
    # quality: long enough, not stopword-soup, plausible word lengths
    quality = round6(
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.5
        + (1.0 - F.least(stopword_ratio * 2, F.lit(1.0))) * 0.25
        + F.when((mean_tok >= 3) & (mean_tok <= 10), F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return counted.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_measured"),
        round6(stopword_ratio).alias("stopword_ratio"),
        round6(mean_tok).alias("mean_token_len"),
        quality.alias("quality"),
    )


def token_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, subword_est): whitespace token count and a
    BPE-ish estimate — Σ ceil(len(token)/4) (≈4 chars/BPE token)."""
    tokenized = documents.select(
        "doc_id", F.split(F.col(text_col), " ").alias("__tk")
    )
    return tokenized.select(
        "doc_id",
        F.size("__tk").cast("long").alias("ws_tokens"),
        F.aggregate(
            F.col("__tk"),
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
        ).alias("subword_est"),
    )


def fingerprints(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): md5 over lowercased whitespace-normalized
    text — portable to the SQL oracle bit-for-bit."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return documents.select("doc_id", F.md5(norm).alias("fingerprint"))


# polynomial rolling hash: h = fold(chars, 0, (a, c) -> (a*31 + c) mod M)
# — M = 2^31-1 keeps every intermediate < 2^36, far inside long range
# (ANSI-safe), and the fold is left-associative so Spark's F.aggregate
# and DuckDB's list_reduce (0-prepended) compute the identical value.
ROLL_BASE = 31
ROLL_MOD = 2_147_483_647


def _poly_hash(col):
    codes = F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLL_BASE + c) % ROLL_MOD,
    )


def rolling_fingerprint(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, roll_hash): whole-document polynomial rolling hash —
    the classic Rabin–Karp content fingerprint, entirely JVM-side.
    Empty texts are excluded (no content to fingerprint; also the one
    spot where Spark's ascii('') = 0 and DuckDB's ord('') = -1
    diverge)."""
    return documents.filter(F.length(F.col(text_col)) > 0).select(
        "doc_id", _poly_hash(F.col(text_col)).alias("roll_hash")
    )


def winnowed_fingerprints(
    documents: DataFrame, text_col: str = "text", k: int = 8, window: int = 4
) -> DataFrame:
    """(doc_id, fp) — winnowing document fingerprints (the MOSS
    algorithm, Schleimer et al. SIGMOD'03): hash every character
    k-gram with the polynomial rolling hash, then keep the MINIMUM
    hash of each ``window`` of consecutive k-grams, distinct per doc.
    Any shared substring of length ≥ k + window - 1 between two
    documents is guaranteed to share a fingerprint — so near-dup /
    plagiarism candidates are an equi-join on ``fp``.

    Scale shape: map-side expression work per document; the downstream
    candidate join shuffles only (fp, doc_id) pairs, never text. The
    higher-order-function hash evaluates INTERPRETED (outside
    whole-stage codegen), so when the input arrives in fewer splits
    than cores the corpus is first repartitioned to full width — the
    one case where a shuffle is cheaper than the map it feeds."""
    spark = documents.sparkSession
    width = spark.sparkContext.defaultParallelism
    if documents.rdd.getNumPartitions() < width:
        documents = documents.repartition(width)
    text = F.col(text_col)
    gram_starts = F.sequence(
        F.lit(1), F.greatest(F.length(text) - k + 1, F.lit(1))
    )
    grams = F.transform(gram_starts, lambda i: _poly_hash(text.substr(i, F.lit(k))))
    # materialize the k-gram hash array once per row: captured inside
    # the window lambda it would be re-hashed for EVERY window start —
    # O(len²) rolling hashes per document (guide §1.2)
    hashed = documents.filter(F.length(text) > 0).select(
        "doc_id", grams.alias("__grams")
    )
    win_starts = F.sequence(
        F.lit(1), F.greatest(F.size("__grams") - window + 1, F.lit(1))
    )
    fps = F.transform(
        win_starts, lambda j: F.array_min(F.slice("__grams", j, window))
    )
    return hashed.select("doc_id", F.explode(F.array_distinct(fps)).alias("fp"))


# PII scrubbing: sequential count-then-replace. Patterns restricted to
# syntax with identical semantics in Java regex (Spark) and RE2
# (DuckDB oracle): character classes, greedy counted repetition — no
# lookaround, no backreferences, no word boundaries.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^ ]+", "<URL>"),
    ("phone", r"\+\d[\d\- ]{5,}\d", "<PHONE>"),
    ("id_number", r"\d{6,}", "<ID>"),
)


def scrub_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII-shaped spans; emit per-category match counts.

    Each category is counted on the text as it stands AFTER the previous
    replacements (so a URL containing digits is one <URL>, not also an
    <ID>), then replaced — one deterministic sequential policy, entirely
    in JVM regex expressions (map-only; no shuffle, no Python).
    """
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    keep = [c for c in documents.columns if c != text_col]
    return documents.select(*keep, cur.alias("clean"), *counts)


# Shared derivation for the PII gate query and benchmark: deterministic
# PII-shaped contact strings keyed by doc id. CONTACT_SQL is the DuckDB
# twin the oracle generator embeds — one module owns both so the Spark
# expression, the benchmark workload, and the oracle cannot drift.
CONTACT_SQL = (
    "'user' || CAST(doc_id AS VARCHAR) || '@mail.example.com call "
    "+1-555-4242 see https://ex.example.com/d/' || CAST(doc_id AS VARCHAR)"
    " || ' ref 9' || lpad(CAST(doc_id AS VARCHAR), 8, '0')"
)


def inject_contact(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, text) with the injected contact string (see CONTACT_SQL)."""
    sid = F.col(id_col).cast("string")
    contact = F.concat(
        F.lit("user"), sid, F.lit("@mail.example.com call +1-555-4242 see "),
        F.lit("https://ex.example.com/d/"), sid,
        F.lit(" ref 9"), F.lpad(sid, 8, "0"),
    )
    return documents.select(id_col, contact.alias("text"))


def tfidf_top_terms(
    documents: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf, score, term_rank) — top-k terms per document
    by tf·idf (idf = ln(N/df), natural log in both engines; round6
    absorbs last-ulp libm differences).

    Plan shape: one explode → per-(doc, term) count (partial agg), df
    per term on the aggregated table (terms ≪ tokens), idf joined back
    on the term key (AQE-chosen strategy — the vocab dim grows with
    corpus, so no hard broadcast hint), per-doc top-k window. The
    corpus text never shuffles — only (doc, term, tf) rows do."""
    from pyspark.sql import Window

    from ..functions.precision import round6

    n_docs = documents.count()
    toks = documents.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    # the per-term df dim scales with VOCABULARY (grows with corpus) —
    # no hard broadcast hint; term-keyed shuffle join co-partitions
    # with the tf aggregate, AQE broadcasts when it actually fits
    scored = tf.join(df_, "term").withColumn(
        "score", round6(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= k)
        .select("doc_id", "term", "tf", "score", "term_rank")
    )


def lm_quality(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_bigrams, avg_logp) — language-model quality score: a
    bigram model with add-one smoothing trained on the corpus itself,
    each document scored by its mean bigram log-probability. This is
    the CCNet/KenLM-style LM filter of a training-data pipeline (docs
    whose token transitions are atypical for the corpus score low),
    self-contained so both engines can derive the identical model.

    p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V). Per-instance log terms
    are quantized to integer micro-units BEFORE summation, so the
    per-doc sum is exact integer math — aggregation-order-proof, the
    same trick as the HLL register fold. Plan shape: bigram instances
    join the count dims (counts ≪ instances; the w1 dim broadcast-able
    at vocab scale), one groupBy(doc_id) finish; document text never
    shuffles.

    Documents with fewer than two tokens have no bigrams and are
    absent from the output."""
    from ..functions.precision import round6

    # split once per row (guide §1.2): element_at(toks, ·) inside the
    # transform lambda would re-tokenize the document per bigram
    tokenized = documents.select(
        "doc_id", F.split(F.col(text_col), " ").alias("__tk")
    )
    toks = F.col("__tk")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bigrams = tokenized.select("doc_id", F.explode(pairs).alias("bg")).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    unigrams = tokenized.select(F.explode(toks).alias("w1"))
    c1 = unigrams.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    vocab_size = unigrams.agg(
        F.countDistinct("w1").cast("long").alias("__v")
    )
    c2 = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c2")
    )
    term_u = F.floor(
        F.log((F.col("c2") + 1) / (F.col("c1") + F.col("__v"))) * 1000000.0
        + 0.5
    ).cast("long")
    scored = (
        bigrams.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab_size))
        .select("doc_id", term_u.alias("term_u"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        round6(
            F.sum("term_u") / (F.lit(1000000.0) * F.count(F.lit(1)))
        ).alias("avg_logp"),
    )


def winnow_match_pairs(
    documents: DataFrame,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 4,
    max_df: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, shared_fps) — the MOSS match stage on top of
    :func:`winnowed_fingerprints`: document pairs sharing at least
    ``min_shared`` winnowed fingerprints, i.e. pairs with several
    guaranteed-common substrings of length ≥ k + window − 1
    (plagiarism / wholesale-quotation candidates).

    The join moves only (fp, doc_id) pairs. ``max_df`` drops
    fingerprints appearing in more than that many documents BEFORE the
    self-join — MOSS's common-substring suppression: boilerplate/hot
    fingerprints carry no pair signal but dominate the join's fan-out
    (cost ∝ Σ df², so one fp shared by every doc is a full cross
    product). Copied passages still match through their RARE
    fingerprints. At scale always set it (the gate uses 5; the
    tiny-vocabulary synthetic corpus repeats 8-char substrings
    everywhere, which is exactly the boilerplate regime)."""
    # truncate the fingerprint lineage once: the expensive interpreted
    # hash (winnowed_fingerprints handles its own parallelism) would
    # otherwise re-evaluate for the df counts and per self-join side.
    # The checkpointed relation is the MOSS index: (doc_id, fp) pairs,
    # tiny next to text.
    fps = winnowed_fingerprints(
        documents, text_col, k=k, window=window
    ).localCheckpoint(eager=True)
    if max_df is not None:
        df_counts = fps.groupBy("fp").agg(
            F.count(F.lit(1)).cast("long").alias("__df")
        )
        fps = (
            fps.join(df_counts.filter(F.col("__df") <= max_df), "fp")
            .drop("__df")
        )
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(b, F.col("a.fp") == F.col("b.fp"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def repetition_scores(
    documents: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, n_grams, n_distinct, rep_ratio) — intra-document
    repetition signal (the C4/Gopher 'repeated n-gram fraction'
    cleaning rule): rep_ratio = 1 − distinct/total over the doc's
    word n-grams; 0 for docs shorter than n tokens.

    Entirely map-side array expressions (no explode, no shuffle): at
    100 TB this is a projection fused into whatever scan already reads
    the text."""
    # split once per row (guide §1.2): element_at(toks, ·) inside the
    # transform lambda would re-tokenize the document per n-gram, and
    # the gram array feeds both size() and array_distinct()
    tokenized = documents.select(
        "doc_id", F.split(F.col(text_col), " ").alias("__tk")
    )
    toks = F.col("__tk")
    gram_arr = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grammed = tokenized.select("doc_id", gram_arr.alias("__grams"))
    grams = F.col("__grams")
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return grammed.select(
        "doc_id",
        total.cast("long").alias("n_grams"),
        distinct.cast("long").alias("n_distinct"),
        F.when(total > 0, round6(1 - distinct / total))
        .otherwise(F.lit(0.0))
        .alias("rep_ratio"),
    )


def lm_buckets(
    documents: DataFrame,
    text_col: str = "text",
    lo_q: float = 1.0 / 3,
    hi_q: float = 2.0 / 3,
) -> DataFrame:
    """(doc_id, avg_logp, bucket) — CCNet's perplexity bucketing on top
    of :func:`lm_quality`: 'head' = best-scoring third of the corpus
    (avg bigram log-prob ≥ the hi_q quantile), 'tail' = worst third,
    'middle' between. The thresholds are one 2-value corpus aggregate
    broadcast into a map-side CASE — no per-doc shuffle beyond
    lm_quality's own."""
    scored = lm_quality(documents, text_col).select("doc_id", "avg_logp")
    cuts = scored.agg(
        F.percentile("avg_logp", F.lit(lo_q)).alias("__lo"),
        F.percentile("avg_logp", F.lit(hi_q)).alias("__hi"),
    )
    return (
        scored.join(F.broadcast(cuts))
        .select(
            "doc_id",
            "avg_logp",
            F.when(F.col("avg_logp") >= F.col("__hi"), F.lit("head"))
            .when(F.col("avg_logp") < F.col("__lo"), F.lit("tail"))
            .otherwise(F.lit("middle"))
            .alias("bucket"),
        )
    )


def language_token_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(lang, n_docs, median_tokens, p90_tokens, mean_tokens) — the
    per-language corpus profile a mixture-weighting step consumes
    (which languages are long-form, where the token budget goes).
    Token counts are map-side; one groupBy(lang) with exact-sort
    percentiles (Spark percentile ≡ DuckDB quantile_cont bit-for-bit)
    and a mean from BIGINT sums."""
    toks = F.size(_tokens(text_col)).cast("long")
    return (
        documents.select("lang", toks.alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            round6(F.percentile("n_tokens", F.lit(0.5))).alias("median_tokens"),
            round6(F.percentile("n_tokens", F.lit(0.9))).alias("p90_tokens"),
            round6(F.sum("n_tokens") / F.count(F.lit(1))).alias("mean_tokens"),
        )
    )


def bm25_top_terms(
    documents: DataFrame,
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, score, term_rank) — top-k terms per document
    by Okapi BM25 weight, the retrieval-grade refinement of
    :func:`tfidf_top_terms` (saturating tf, document-length
    normalization): score = idf(t) · tf·(k1+1) / (tf + k1·(1 − b +
    b·dl/avgdl)) with the robust idf = ln(1 + (N − df + 0.5)/(df +
    0.5)).

    Exactness contract: tf, df, dl are exact longs; avgdl is ONE
    double division of two exact integer sums (Σdl / N over ALL
    documents, including token-less ones); the score expression is
    evaluated in the same literal operation order in both engines, and
    round6 absorbs last-ulp libm ln differences — the tfidf contract.

    Plan shape mirrors tfidf_top_terms: one explode → (doc, term)
    count; df and dl both derive from that aggregate (terms ≪ tokens);
    the vocab-scale df dim joins on the term key with no hard
    broadcast hint (AQE decides); avgdl is a 1-row broadcast. The
    corpus text never shuffles — only (doc, term, tf) rows do."""
    from pyspark.sql import Window

    from ..functions.precision import round6

    n_docs = documents.count()
    toks = documents.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    avgdl = tf.agg(
        (F.sum("tf").cast("double") / F.lit(float(n_docs))).alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "score", round6(idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom)
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= k)
        .select("doc_id", "term", "tf", "score", "term_rank")
    )


def skipgram_pairs(
    documents: DataFrame, window: int = 2, min_count: int = 2
) -> DataFrame:
    """Word2vec-style skip-gram pair counts: (center, context,
    n_pairs) over whitespace tokens, counting every (token at p,
    token at p+d) for 0 < |d| ≤ window — the co-occurrence corpus a
    skip-gram/GloVe embedding trainer consumes (the textual twin of
    graph.random_walks' node corpus).

    Shape at scale: the naive formulation joins tokens to tokens on
    doc_id with a |Δpos| ≤ w band — tokens² fan-out per document.
    Here each token instead EXPLODES its 2w offsets map-side (a
    ≤2w-row literal dim, broadcast) and equi-joins on (doc_id, pos) —
    keyed join, fan-out exactly 2w per token, partial-aggregated
    counts on (center, context). min_count prunes the hapax tail
    before it shuffles to the output."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    spark = documents.sparkSession
    toks = documents.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")
    offs = spark.createDataFrame(
        [(d,) for d in range(-window, window + 1) if d != 0], "d long"
    )
    centers = toks.crossJoin(F.broadcast(offs)).select(
        "doc_id",
        F.col("tok").alias("center"),
        (F.col("pos") + F.col("d")).alias("cpos"),
    )
    ctx = toks.select(
        "doc_id", F.col("pos").alias("cpos"), F.col("tok").alias("context")
    )
    return (
        centers.join(ctx, ["doc_id", "cpos"])
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .filter(F.col("n_pairs") >= F.lit(min_count))
    )


def kneser_ney_bigrams(
    documents: DataFrame, discount: float = 0.75, min_count: int = 1
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
    Goodman 1999) over whitespace tokens: rows (w1, w2, c12, p_kn)
    with p_kn = max(c12 − D, 0)/c1 + (D·N1+(w1·)/c1)·(N1+(·w2)/B) —
    absolute discounting plus the continuation-probability backoff
    that made KN the standard n-gram smoother (a word's unigram
    backoff mass is how many CONTEXTS it completes, not how often it
    occurs — 'Francisco' is frequent but only ever follows 'San').

    Engine-exact discipline: every ingredient is an integer count
    (c12, c1 = Σ c12 over w1, N1+(w1·) = distinct continuations,
    N1+(·w2) = distinct histories, B = distinct bigram types), combined
    once per output row in a fixed double-expression order and
    round6-ed — the oracle evaluates the identical text.

    Scale shape: one lead-window per document (doc-keyed, the same
    shape as the triple derivation), then token-keyed partial-agg
    counts; c1/N1+ are token-scale dims re-joined on w1/w2; B is a
    1-row aggregate crossJoined broadcast (the corpus-size pattern of
    cooccurrence_pmi). Nothing quadratic, no text shuffle past the
    bigram projection."""
    from pyspark.sql import Window

    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    toks = documents.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w1")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.withColumn("w2", F.lead("w1").over(w))
        .filter(F.col("w2").isNotNull())
        .select("w1", "w2")
    )
    # c12 feeds FOUR consumers (left/right dims, the type total, and
    # the final join) — eager truncation computes the bigram pipeline
    # once; the table is bigram-type-scale, far below the corpus
    c12 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    ).localCheckpoint(eager=True)
    left = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1_fwd"),
    )
    right = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1_bwd")
    )
    btypes = c12.agg(F.count(F.lit(1)).cast("long").alias("b_types"))
    d = F.lit(float(discount))
    joined = (
        c12.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(btypes))
    )
    p = (
        F.greatest(F.col("c12").cast("double") - d, F.lit(0.0))
        / F.col("c1").cast("double")
        + (d * F.col("n1_fwd").cast("double") / F.col("c1").cast("double"))
        * (F.col("n1_bwd").cast("double") / F.col("b_types").cast("double"))
    )
    return joined.filter(F.col("c12") >= F.lit(min_count)).select(
        "w1", "w2", "c12", round6(p).alias("p_kn")
    )


def vocab_coverage(
    documents: DataFrame, min_count: int = 1
) -> DataFrame:
    """Tokenizer-training vocabulary curve: (token, cnt, rank,
    cum_cnt, cum_permille) — tokens ranked by (count desc, token asc)
    with the RUNNING corpus coverage each prefix of the vocabulary
    buys (the "top-V tokens cover X‰ of the corpus" table that decides
    a tokenizer's vocab size). cum_permille = (cum_cnt·1000) div total
    — exact integer division, order-proof.

    No single-partition sort: the global rank AND the running total
    come from rank.global_row_number's two-phase range-diamond
    machinery (weight_col/cum_col mode — one shared implementation of
    the pattern; see rank.py's module docstring for the ReusedExchange
    safety argument). The corpus total is a 1-row crossJoin broadcast.
    Shuffles: token-keyed count partials + one range exchange; the
    window never sees more than a partition."""
    from .rank import global_row_number

    # counts feeds the range exchange AND the corpus total — eager
    # truncation scans the corpus once; the table is vocab-scale
    counts = (
        documents.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(min_count))
        .localCheckpoint(eager=True)
    )
    ranked = global_row_number(
        counts,
        [F.col("cnt").desc(), F.col("token").asc()],
        rank_col="rank",
        weight_col="cnt",
        cum_col="cum_cnt",
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("__total"))
    return ranked.crossJoin(F.broadcast(total)).select(
        "token",
        "cnt",
        "rank",
        "cum_cnt",
        F.expr("(cum_cnt * 1000) div __total")
        .cast("long")
        .alias("cum_permille"),
    )


def word_dropout(
    documents: DataFrame,
    text_col: str = "text",
    rate_permille: int = 150,
) -> DataFrame:
    """(doc_id, text_aug, n_tokens, n_dropped) — deterministic word
    dropout, the standard denoising/robustness augmentation: token at
    position p of doc d drops iff hash60(d|p|token) mod 1000 <
    rate_permille. Hash-Bernoulli instead of RNG (the sampling.py
    verdict rule): the SAME corpus always yields the SAME augmentation
    regardless of partitioning or retries — reproducible training
    data, and the oracle replays it bit-for-bit.

    Map-only: one higher-order filter over the split array per row —
    no shuffle, no UDF; the n_dropped accounting falls out of the two
    array sizes."""
    if not 0 <= rate_permille <= 1000:
        raise ValueError(
            f"rate_permille must be in [0, 1000], got {rate_permille}"
        )
    tokenized = documents.select(
        "doc_id", F.split(F.col(text_col), " ").alias("__tk")
    )
    toks = F.col("__tk")
    idx = F.transform(
        toks,
        lambda t, i: F.struct(t.alias("t"), i.alias("i")),
    )
    kept = F.filter(
        idx,
        lambda s: (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("doc_id").cast("string"),
                            s["i"].cast("string"),
                            s["t"],
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 1000
            >= F.lit(rate_permille)
        ),
    )
    return tokenized.select(
        "doc_id",
        F.concat_ws(" ", F.transform(kept, lambda s: s["t"])).alias("text_aug"),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_dropped"),
    )


def sequence_packing(
    documents: DataFrame,
    text_col: str = "text",
    budget: int = 256,
) -> DataFrame:
    """(doc_id, n_tokens, bin_id, bin_docs, bin_fill) — deterministic
    contiguous sequence packing: documents ordered by (token count
    desc, doc_id asc) are laid end-to-end and cut into bins of
    ``budget`` tokens — bin_id = (running total BEFORE the doc) div
    budget. The packing step every LLM training pipeline runs to turn
    ragged documents into fixed context windows; contiguous cutting is
    the standard streaming approximation of bin packing (a document
    whose tokens straddle a boundary overflows its bin by < its own
    length — stated, not hidden; first-fit-decreasing needs sequential
    state no engine parallelizes exactly). Precondition for contiguous
    bin ids: documents are pre-chunked to ≤ budget tokens — a longer
    doc occupies several budget slots and the following ids skip
    (harmless for grouping, stated for exactness).

    The running total is rank.global_row_number's weighted prefix-sum
    mode — the two-phase range-diamond machinery, NO single-partition
    sort — and bin statistics re-attach with one bin-keyed
    aggregation. Deterministic: same corpus → same bins, any
    partitioning."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    from .rank import global_row_number

    counts = documents.select(
        "doc_id",
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    ranked = global_row_number(
        counts,
        [F.col("n_tokens").desc(), F.col("doc_id").asc()],
        rank_col="__rank",
        weight_col="n_tokens",
        cum_col="__cum",
    ).select(
        "doc_id",
        "n_tokens",
        F.expr(f"(__cum - n_tokens) div {budget}").cast("long").alias("bin_id"),
    )
    bins = ranked.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("bin_docs"),
        F.sum("n_tokens").cast("long").alias("bin_fill"),
    )
    return ranked.join(bins, "bin_id").select(
        "doc_id", "n_tokens", "bin_id", "bin_docs", "bin_fill"
    )
