from __future__ import annotations

from wikidata_qrank_spark.operators.textstats import (
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "abcd efgh"), (2, "a bb ccc dddd eeeee")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.ws_tokens, r.subword_est) for r in token_counts(df).collect()}
    # doc1: 2 tokens, ceil(4/4)+ceil(4/4)=2; doc2: 5 tokens, 1+1+1+1+2=6
    assert got == {1: (2, 2), 2: (5, 6)}


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze und das haus"),
            (3, "le chat et la maison et les arbres"),
            (4, "xyzzy plugh foobar"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.predicted_lang for r in language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_monotone_in_length(spark):
    df = spark.createDataFrame(
        [(1, "word " * 63 + "word"), (2, "word word")], "doc_id long, text string"
    )
    got = {r.doc_id: r.quality for r in quality_scores(df).collect()}
    assert got[1] > got[2]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.fingerprint for r in fingerprints(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_scrub_pii_sequential_policy(spark):
    """Emails/URLs/phones/ids redacted; counts reflect the text state
    at each stage (URL digits are not double-counted as IDs)."""
    from wikidata_qrank_spark.operators.textstats import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail me@x.org or visit https://x.org/a/123456789 id 99887766"),
            (2, "call +1-555-4242 now"),
            (3, "plain words only"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert rows[1].clean == "mail <EMAIL> or visit <URL> id <ID>"
    assert (rows[1].n_email, rows[1].n_url, rows[1].n_id_number) == (1, 1, 1)
    assert rows[2].clean == "call <PHONE> now"
    assert rows[2].n_phone == 1
    assert rows[3].clean == "plain words only"
    assert (rows[3].n_email, rows[3].n_url, rows[3].n_phone, rows[3].n_id_number) == (
        0, 0, 0, 0,
    )


def test_ngram_contamination_flags_overlap(spark):
    from wikidata_qrank_spark.operators.dedup import ngram_contamination

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated sentence about spark plans"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps far away")], "doc_id long, text string"
    )
    got = {
        (r.train_doc, r.bench_doc): r.shared_ngrams
        for r in ngram_contamination(train, bench, n=3, min_shared=2).collect()
    }
    # shared 3-grams: 'quick brown fox', 'brown fox jumps'
    assert got == {(1, 100): 2}


def test_tfidf_top_terms(spark):
    """Doc-discriminating terms outrank ubiquitous ones; k per doc."""
    from wikidata_qrank_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "cherry common common"),
            (3, "banana cherry common"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.term_rank, r.term, r.score))
    assert all(len(v) == 2 for v in by_doc.values())
    # 'common' appears in every doc → idf = ln(1) = 0 → never top where
    # any rarer term exists
    top1 = {d: sorted(v)[0][1] for d, v in by_doc.items()}
    assert top1[1] == "apple" and top1[2] == "cherry"
    assert all(s >= 0 for v in by_doc.values() for _, _, s in v)


def test_curate_corpus_filters(spark):
    """Curation drops dup victims, low-quality docs, and docs without a
    confident language — keeps the rest with (lang, quality)."""
    from wikidata_qrank_spark.operators.textstats import curate_corpus

    good = "the cat and the dog went to the market of the town " * 6
    rows = [
        (1, good),                      # keeper (English markers, long)
        (2, good),                      # exact dup of 1 → victim
        (3, "zz"),                      # low quality, no language
        (4, "und und und"),             # wait — 'und' is a German marker
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.predicted_lang for r in curate_corpus(docs, min_quality=0.4).collect()}
    assert 1 in got and got[1] == "en"
    assert 2 not in got  # dup victim (min doc_id survives)
    assert 3 not in got  # low quality / no markers


def test_winnowed_fingerprints_guarantee(spark):
    """Winnowing guarantee (Schleimer et al.): two docs sharing a
    substring of length >= k + window - 1 share at least one
    fingerprint; unrelated docs (here: disjoint alphabets) share none.
    Also: the whole-doc rolling hash matches the hand-computed fold."""
    from wikidata_qrank_spark.operators.textstats import (
        ROLL_BASE,
        ROLL_MOD,
        rolling_fingerprint,
        winnowed_fingerprints,
    )

    shared = "the quick brown fox jumps over it"  # 33 chars >= 8+4-1
    rows = [
        (1, "aaa " + shared + " bbb"),
        (2, "ccc " + shared + " ddd"),
        (3, "zzzz yyyy xxxx wwww vvvv uuuu"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnowed_fingerprints(docs, k=8, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])

    got = rolling_fingerprint(spark.createDataFrame([(1, "abc")], "doc_id long, text string")).first().roll_hash
    want = 0
    for ch in "abc":
        want = (want * ROLL_BASE + ord(ch)) % ROLL_MOD
    assert got == want


def test_lm_quality_hand_model(spark):
    """Tiny corpus where the model is computable by hand: vocab
    {a,b,c}, doc 1 = 'a b a b', doc 2 = 'a c'. V=3;
    c1: a=3,b=2,c=1; c2: (a,b)=2,(b,a)=1,(a,c)=1."""
    import math

    from wikidata_qrank_spark.operators.textstats import lm_quality

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "z")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_bigrams, r.avg_logp) for r in lm_quality(docs).collect()}
    V = 4  # a, b, c, z

    def term(c2, c1):
        return math.floor(math.log((c2 + 1) / (c1 + V)) * 1e6 + 0.5)

    # doc 1 bigrams: (a,b), (b,a), (a,b)
    t_ab = term(2, 3)
    t_ba = term(1, 2)
    exp1 = math.floor((t_ab + t_ba + t_ab) / (1e6 * 3) * 1e6 + 0.5) / 1e6
    # doc 2: (a,c)
    t_ac = term(1, 3)
    exp2 = math.floor(t_ac / 1e6 * 1e6 + 0.5) / 1e6
    assert got[1] == (3, exp1)
    assert got[2] == (1, exp2)
    assert 3 not in got  # single-token doc: no bigrams

    # repeated-phrase doc scores HIGHER than a doc of rare transitions
    assert got[1][1] > got[2][1]


def test_corpus_prep_composition_invariants(spark):
    """Capstone pipeline: no near-dup victim survives, every survivor
    passes curation thresholds, and the injected copies that DO appear
    are cluster representatives."""
    from wikidata_qrank_spark.operators.clusters import dup_clusters_scaled
    from wikidata_qrank_spark.operators.dedup import inject_near_dups
    from wikidata_qrank_spark.plans.training_data import corpus_prep

    from tests.conftest import SF_SMOKE

    sf = SF_SMOKE
    out = corpus_prep(spark, sf).collect()
    assert len(out) > 0
    assert all(r.quality >= 0.5 and r.predicted_lang != "und" for r in out)
    assert all(r.ws_tokens > 0 for r in out)

    corpus = inject_near_dups(spark.read.parquet(f"{sf}/documents.parquet"))
    comp = dup_clusters_scaled(corpus, threshold=0.5, hash_family="md5")
    victims = {
        r.doc_id for r in comp.filter("doc_id != component").collect()
    }
    kept = {r.doc_id for r in out}
    assert kept.isdisjoint(victims)


def test_corpus_prep_strategies_equivalent(spark):
    """The three materialization strategies (lazy / checkpoint_ids /
    cache_text) are performance choices only — identical output."""
    from tests.conftest import SF_SMOKE
    from wikidata_qrank_spark.plans.training_data import corpus_prep

    results = {}
    for s in ("lazy", "checkpoint_ids", "cache_text"):
        results[s] = {
            tuple(r)
            for r in corpus_prep(spark, SF_SMOKE, strategy=s).collect()
        }
        spark.catalog.clearCache()
    assert results["lazy"] == results["checkpoint_ids"] == results["cache_text"]
    assert len(results["lazy"]) > 0


def test_bm25_top_terms_hand_computed(spark):
    """Two tiny docs; BM25 of doc 1's unique term matches the formula
    evaluated by hand, and per-doc ranks are by score desc, term asc."""
    import math

    from wikidata_qrank_spark.operators.textstats import bm25_top_terms

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry")],
        "doc_id long, text string",
    )
    rows = bm25_top_terms(docs, k=3).collect()
    got = {(r.doc_id, r.term): (r.tf, r.score, r.term_rank) for r in rows}
    n, avgdl = 2.0, 5 / 2.0
    # doc 1, 'apple': tf=2, df=1, dl=3
    idf = math.log(1.0 + (n - 1 + 0.5) / (1 + 0.5))
    denom = 2 + 1.2 * (0.25 + 0.75 * 3 / avgdl)
    expect = math.floor(idf * (2 * 2.2) / denom * 1e6 + 0.5) / 1e6
    assert got[(1, "apple")] == (2, expect, 1)
    # 'banana' appears in both docs -> idf ln(1 + 0.5/2.5), positive
    assert got[(1, "banana")][2] == 2 and got[(1, "banana")][1] > 0
    # doc 2 rank order: cherry (df=1) outscores banana (df=2)
    assert got[(2, "cherry")][2] == 1 and got[(2, "banana")][2] == 2


def test_bm25_ignores_empty_tokens_and_tokenless_docs(spark):
    from wikidata_qrank_spark.operators.textstats import bm25_top_terms

    docs = spark.createDataFrame(
        [(1, "a  b"), (2, "")], "doc_id long, text string"
    )
    rows = bm25_top_terms(docs, k=3).collect()
    assert {r.doc_id for r in rows} == {1}
    assert {r.term for r in rows} == {"a", "b"}


def test_skipgram_pairs_window_golden(spark):
    """'a b c d' at window 2: every (center, context) with
    0 < |Δpos| <= 2, counted across two identical docs so min_count=2
    keeps them all; window 1 drops the distance-2 pairs."""
    from wikidata_qrank_spark.operators.textstats import skipgram_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    got = {(r.center, r.context): r.n_pairs
           for r in skipgram_pairs(docs, window=2, min_count=2).collect()}
    expect_pairs = set()
    toks = ["a", "b", "c", "d"]
    for i, c in enumerate(toks):
        for d in (-2, -1, 1, 2):
            j = i + d
            if 0 <= j < len(toks):
                expect_pairs.add((c, toks[j]))
    assert set(got) == expect_pairs
    assert all(v == 2 for v in got.values())  # one per doc
    w1 = {(r.center, r.context)
          for r in skipgram_pairs(docs, window=1, min_count=2).collect()}
    assert ("a", "c") not in w1 and ("a", "b") in w1


def test_skipgram_min_count_prunes(spark):
    from wikidata_qrank_spark.operators.textstats import skipgram_pairs

    docs = spark.createDataFrame(
        [(1, "x y"), (2, "p q")], "doc_id long, text string"
    )
    assert skipgram_pairs(docs, window=2, min_count=2).count() == 0
    got = {(r.center, r.context)
           for r in skipgram_pairs(docs, window=2, min_count=1).collect()}
    assert got == {("x", "y"), ("y", "x"), ("p", "q"), ("q", "p")}


def test_kneser_ney_hand_golden(spark):
    """Corpus 'a b a c' + 'b a': hand-computed interpolated KN with
    D=0.75 — discounted ML term plus continuation backoff. Seen-mass
    check: probabilities are in (0,1) and the seen continuations of a
    context sum to < 1 (the discount reserves mass for unseen)."""
    from wikidata_qrank_spark.operators.textstats import kneser_ney_bigrams

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b a")], "doc_id long, text string"
    )
    got = {(r.w1, r.w2): (r.c12, r.p_kn)
           for r in kneser_ney_bigrams(docs).collect()}
    assert got == {
        ("a", "b"): (1, 0.375),
        ("a", "c"): (1, 0.375),
        ("b", "a"): (2, 0.75),
    }
    assert got[("a", "b")][1] + got[("a", "c")][1] < 1.0


def test_vocab_coverage_golden_with_ties(spark):
    """'b b a a c' ranks (count desc, token asc): a and b tie at 2 ->
    a first; cumulative permille is exact integer division of the
    running total."""
    from wikidata_qrank_spark.operators.textstats import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "b b a a c")], "doc_id long, text string"
    )
    got = {r.token: (r.rank, r.cnt, r.cum_cnt, r.cum_permille)
           for r in vocab_coverage(docs).collect()}
    assert got == {
        "a": (1, 2, 2, 400),
        "b": (2, 2, 4, 800),
        "c": (3, 1, 5, 1000),
    }


def test_vocab_coverage_two_phase_matches_single_window(spark):
    """Partitioning-independence: the two-phase rank/prefix-sum over a
    200-token Zipf-ish corpus equals the single-window computation."""
    from pyspark.sql import Window
    from wikidata_qrank_spark.operators.textstats import vocab_coverage

    text = " ".join(f"tok{i % 23 % (1 + i % 7)}" for i in range(200))
    docs = spark.createDataFrame(
        [(i, text[i:] or "x") for i in range(5)], "doc_id long, text string"
    )
    got = sorted(tuple(r) for r in vocab_coverage(docs).collect())
    counts = (
        docs.selectExpr("explode(split(text, ' ')) AS token")
        .groupBy("token")
        .count()
    )
    from pyspark.sql import functions as FF

    w = Window.orderBy(FF.col("count").desc(), FF.col("token").asc())
    ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = counts.agg(FF.sum("count")).collect()[0][0]
    ref = sorted(
        (r.token, r["count"], r.rank, r.cum,
         (r.cum * 1000) // total)
        for r in counts.select(
            "token", "count",
            FF.row_number().over(w).alias("rank"),
            FF.sum("count").over(ws).alias("cum"),
        ).collect()
    )
    assert got == ref


def test_word_dropout_deterministic_and_hash_replay(spark):
    """Augmentation is a pure function of content: identical across
    runs AND replayable with hashlib; rate=0 is identity, rate=1000
    drops everything."""
    import hashlib

    from wikidata_qrank_spark.operators.textstats import word_dropout

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "one two")],
        "doc_id long, text string",
    )
    a = {r.doc_id: tuple(r) for r in word_dropout(docs, rate_permille=400).collect()}
    b = {r.doc_id: tuple(r) for r in word_dropout(docs, rate_permille=400).collect()}
    assert a == b
    for doc_id, text in [(1, "alpha beta gamma delta epsilon zeta"), (2, "one two")]:
        toks = text.split(" ")
        kept = [
            t for i, t in enumerate(toks)
            if int(hashlib.md5(f"{doc_id}|{i}|{t}".encode()).hexdigest()[:15], 16)
            % 1000 >= 400
        ]
        assert a[doc_id][1] == " ".join(kept)
        assert a[doc_id][3] == len(toks) - len(kept)
    ident = {r.doc_id: r.text_aug
             for r in word_dropout(docs, rate_permille=0).collect()}
    assert ident[1] == "alpha beta gamma delta epsilon zeta"
    full = word_dropout(docs, rate_permille=1000).collect()
    assert all(r.text_aug == "" and r.n_dropped == r.n_tokens for r in full)


def test_sequence_packing_golden_and_invariants(spark):
    """Docs of 6/5/4/3 tokens at budget 8 in desc order: cum-before
    0,6,11,15 -> bins 0,0,1,1; bin stats re-attach per doc; total fill
    equals total tokens; packing is partitioning-independent (equals a
    single-window replay)."""
    from wikidata_qrank_spark.operators.textstats import sequence_packing

    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    docs = spark.createDataFrame(
        [(1, words(6, "a")), (2, words(5, "b")),
         (3, words(4, "c")), (4, words(3, "d"))],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.bin_id, r.bin_docs, r.bin_fill)
           for r in sequence_packing(docs, budget=8).collect()}
    assert got == {
        1: (6, 0, 2, 11),
        2: (5, 0, 2, 11),
        3: (4, 1, 2, 7),
        4: (3, 1, 2, 7),
    }
    assert sum(v[0] for v in got.values()) == 18
