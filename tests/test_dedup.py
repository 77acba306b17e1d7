from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_qrank_spark.operators.dedup import (
    dedup_exact,
    exact_duplicate_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog again and again tonight"),  # near dup
    (4, "completely different content about spark shuffles and partitions here"),
    (5, "COMPLETELY  different content about spark shuffles and partitions here"),  # ws/case dup of 4
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicate_groups(spark):
    groups = exact_duplicate_groups(_docs(spark)).collect()
    got = sorted(tuple(r.doc_ids) for r in groups)
    assert got == [[1, 2], [4, 5]] or got == [(1, 2), (4, 5)]


def test_dedup_exact_keeps_lowest_id(spark):
    kept = sorted(r.doc_id for r in dedup_exact(_docs(spark)).collect())
    assert kept == [1, 3, 4]


def test_ngram_jaccard_near_dup(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    # 4/5 share the tail trigrams but differ at the head (case + double
    # space change the leading grams): similar but not identical
    assert (4, 5) in pairs and pairs[(4, 5)] < 1.0
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(_docs(spark)).collect()
    }
    assert (1, 2) in pairs  # identical → all bands equal
    assert (1, 3) in pairs  # 1-token diff → some band collides
    assert (1, 4) not in pairs


def test_simhash_near_pairs(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_pairs(_docs(spark), max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 10
    assert (1, 4) not in pairs


def test_minhash_is_deterministic(spark):
    a = {tuple(r) for r in minhash_lsh_pairs(_docs(spark)).collect()}
    b = {tuple(r) for r in minhash_lsh_pairs(_docs(spark)).collect()}
    assert a == b


def test_minhash_agg_form_equals_exploded_form(spark):
    """The single-groupBy min-aggregate signatures (docs×1 shuffle rows)
    must equal the round-1 posexplode formulation (docs×32 rows)."""
    from wikidata_qrank_spark.operators.dedup import (
        _minhash_signatures_exploded,
        minhash_signatures,
    )

    docs = _docs(spark)
    new = {r.doc_id: list(r.sig) for r in minhash_signatures(docs).collect()}
    old = {r.doc_id: list(r.sig) for r in _minhash_signatures_exploded(docs).collect()}
    assert new == old


def test_minhash_md5_family_finds_near_dups(spark):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(_docs(spark), hash_family="md5").collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) in pairs
    assert (1, 4) not in pairs


def test_simhash_portable_matches_pigeonhole_semantics(spark):
    """Portable band-key simhash: exact dups at hamming 0; unrelated
    docs absent; symmetric-deterministic across runs."""
    from wikidata_qrank_spark.operators.dedup import simhash_near_pairs_portable

    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_pairs_portable(_docs(spark), max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 4) not in pairs
    again = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_pairs_portable(_docs(spark), max_hamming=3).collect()
    }
    assert pairs == again


def test_simhash_portable_band_keys_bounded(spark):
    """Band keys are 16-bit — safe in any SQL engine (no sign-bit play)."""
    from wikidata_qrank_spark.operators.dedup import simhash_band_keys

    rows = simhash_band_keys(_docs(spark)).collect()
    for r in rows:
        for b in range(4):
            assert 0 <= r[f"k{b}"] < (1 << 16)


def test_jaccard_prefix_equals_naive_exact_join(spark):
    """Prefix filtering is LOSSLESS: same pairs and values as the naive
    all-pairs exact join, at several thresholds (including one low
    enough that prefixes span most of each doc)."""
    from wikidata_qrank_spark.operators.dedup import jaccard_prefix_pairs

    docs = _docs(spark)
    for t in (0.06, 0.5, 0.9):
        naive = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in ngram_jaccard_pairs(docs, n=3, threshold=t).collect()
        }
        pref = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in jaccard_prefix_pairs(docs, n=3, threshold=t).collect()
        }
        assert pref == naive, f"threshold {t}"


def test_jaccard_prefix_on_injected_corpus(spark):
    """On the near-dup-injected smoke corpus the prefix join reproduces
    the naive join exactly (the gate re-proves this vs DuckDB)."""
    from wikidata_qrank_spark.operators.dedup import (
        inject_near_dups,
        jaccard_prefix_pairs,
    )

    docs = inject_near_dups(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    naive = set(
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    )
    pref = set(
        (r.doc_a, r.doc_b)
        for r in jaccard_prefix_pairs(docs, n=3, threshold=0.5).collect()
    )
    assert pref == naive and len(pref) > 0


def test_edit_distance_pairs_matches_naive(spark):
    """Deletion-neighborhood join = naive quadratic scan, including the
    'ab'/'ba' false-positive case the verify step must reject."""
    from itertools import combinations

    from wikidata_qrank_spark.operators.dedup import edit_distance_pairs

    words = ["spark", "spork", "sparks", "park", "ab", "ba", "banana", "bananas"]
    vocab = spark.createDataFrame([(w,) for w in words], "token string")
    got = {(r.tok_a, r.tok_b) for r in edit_distance_pairs(vocab).collect()}

    def lev(s, t):
        d = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            prev, d[0] = d[0], i
            for j, ct in enumerate(t, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (cs != ct))
        return d[-1]

    want = {
        tuple(sorted(p)) for p in combinations(words, 2) if lev(*p) <= 1
    }
    assert got == want
    assert ("ab", "ba") not in got  # neighborhood FP, rejected by verify


def test_jaccard_prefix_float_boundary_threshold(spark):
    """t=0.07 on a 100-shingle doc: 100*0.07 evaluates to 7.0000…01 in
    doubles; a naive ceil would over-shorten the prefix and drop pairs.
    Equality with the naive join proves the epsilon guard."""
    from wikidata_qrank_spark.operators.dedup import jaccard_prefix_pairs

    base = [f"w{i:03d}" for i in range(102)]  # 100 3-gram shingles
    # doc 2 shares a window of tokens with doc 1 → a handful of common
    # shingles, jaccard right around 0.07
    other = [f"x{i:03d}" for i in range(88)] + base[:14]
    docs = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(other)), (3, " ".join(reversed(base)))],
        "doc_id long, text string",
    )
    for t in (0.06, 0.07, 0.08):
        naive = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in ngram_jaccard_pairs(docs, n=3, threshold=t).collect()
        }
        pref = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in jaccard_prefix_pairs(docs, n=3, threshold=t).collect()
        }
        assert pref == naive, (t, naive, pref)


def test_jaccard_prefix_fuzz_equality(spark):
    """Seeded random corpora × thresholds: prefix-filtered join equals
    the naive all-pairs join every time (losslessness under fuzz,
    guarding the epsilon'd prefix bound)."""
    import random

    from wikidata_qrank_spark.operators.dedup import jaccard_prefix_pairs

    rng = random.Random(20260817)
    words = [f"w{i}" for i in range(12)]
    for trial in range(5):
        docs = spark.createDataFrame(
            [
                (i, " ".join(rng.choices(words, k=rng.randint(5, 40))))
                for i in range(12)
            ],
            "doc_id long, text string",
        )
        t = rng.choice([0.07, 0.13, 0.25, 0.33, 0.5, 0.66])
        naive = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in ngram_jaccard_pairs(docs, n=3, threshold=t).collect()
        }
        pref = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in jaccard_prefix_pairs(docs, n=3, threshold=t).collect()
        }
        assert pref == naive, (trial, t)


def test_overlap_coefficient_catches_containment(spark):
    """A short doc fully quoted inside a long one: overlap = 1.0 while
    Jaccard is far below any dedup threshold."""
    from wikidata_qrank_spark.operators.dedup import overlap_coefficient_pairs

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"filler{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "unrelated words entirely here now")],
        "doc_id long, text string",
    )
    got = {(r.doc_a, r.doc_b): r.overlap for r in
           overlap_coefficient_pairs(docs, n=3, threshold=0.9).collect()}
    assert got == {(1, 2): 1.0}
    jac = {(r.doc_a, r.doc_b) for r in
           ngram_jaccard_pairs(docs, n=3, threshold=0.9).collect()}
    assert (1, 2) not in jac  # the case Jaccard misses


def test_winnow_match_pairs_max_df_suppression(spark):
    """A copied passage matches through its rare fingerprints; a hot
    boilerplate line shared by every doc is suppressed by max_df."""
    from wikidata_qrank_spark.operators.textstats import winnow_match_pairs

    boiler = "common header line present everywhere"
    passage = "the unique stolen passage that was copied verbatim once"
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + passage + " tail one"),
            (2, boiler + " " + passage + " other ending two"),
            (3, boiler + " totally different content here"),
            (4, boiler + " yet another unrelated body text"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in winnow_match_pairs(docs, min_shared=3, max_df=2).collect()
    }
    assert (1, 2) in got
    assert all(p in {(1, 2)} for p in got), got


def test_jaccard_prefix_selectivity_on_zipf_vocab(spark):
    """The round-3 bench caveat made measurable (VERDICT r3 item #4):
    on a Zipfian vocabulary — the real-corpus regime — the SSJoin
    prefix + PPJoin length filters must admit FAR fewer candidates than
    the naive share-any-shingle join, because prefixes hold each doc's
    rarest shingles. Asserts the selectivity ratio and that the filter
    stays lossless (same final pair set as the naive exact join)."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.dedup import (
        _shingles,
        jaccard_prefix_candidates,
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )
    from wikidata_qrank_spark.sources.synthetic import zipf_documents

    docs = zipf_documents(spark, n_docs=800, vocab_size=5_000, doc_len=30)
    sh = _shingles(docs, "text", 3)

    # the naive join's candidate set: unordered doc pairs sharing >=1
    # shingle
    a, b = sh.alias("a"), sh.alias("b")
    naive_cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    prefix_cand = jaccard_prefix_candidates(sh, threshold=0.5).count()

    assert naive_cand > 1000  # the corpus genuinely has hot shingles
    # candidate collapse: well under 5% of the naive candidate set
    assert prefix_cand < naive_cand * 0.05, (prefix_cand, naive_cand)

    # losslessness on this corpus shape too
    naive = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    fast = {
        (r.doc_a, r.doc_b)
        for r in jaccard_prefix_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert fast == naive


def test_zipf_documents_deterministic_and_zipfian(spark):
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.sources.synthetic import zipf_documents

    d1 = zipf_documents(spark, n_docs=200, vocab_size=1000, doc_len=20)
    d2 = zipf_documents(spark, n_docs=200, vocab_size=1000, doc_len=20)
    assert {tuple(r) for r in d1.collect()} == {tuple(r) for r in d2.collect()}

    tok = d1.select(F.explode(F.split("text", " ")).alias("t"))
    freq = tok.groupBy("t").count().orderBy(F.desc("count"))
    top = freq.limit(1).collect()[0]
    n_distinct = freq.count()
    # Zipf shape: the head token is hot while most of the vocabulary is
    # rare (many distinct tokens relative to corpus size)
    assert top["count"] > 100
    assert n_distinct > 400


def test_containment_prefix_equals_naive_exact_join(spark):
    """The containment-adapted prefix filter is LOSSLESS: same pairs
    and values as the naive overlap-coefficient self-join, at several
    thresholds, on a corpus with a true containment case (doc 20
    quoted wholesale inside doc 21 — Jaccard-small, overlap 1.0)."""
    from wikidata_qrank_spark.operators.dedup import (
        containment_prefix_pairs,
        overlap_coefficient_pairs,
    )

    small = " ".join(f"q{i}" for i in range(12))
    big = " ".join(f"z{i}" for i in range(120)) + " " + small
    docs = spark.createDataFrame(
        list(DOCS) + [(20, small), (21, big)], "doc_id long, text string"
    )
    for t in (0.5, 0.8, 0.95):
        naive = {
            (r.doc_a, r.doc_b): r.overlap
            for r in overlap_coefficient_pairs(docs, n=3, threshold=t).collect()
        }
        pref = {
            (r.doc_a, r.doc_b): r.overlap
            for r in containment_prefix_pairs(docs, n=3, threshold=t).collect()
        }
        assert pref == naive, f"threshold {t}"
        if t <= 0.95:
            assert (20, 21) in pref and pref[(20, 21)] == 1.0


def test_containment_prefix_selectivity_on_zipf_vocab(spark):
    """On a Zipfian vocabulary the smaller-side-prefix × full-set join
    admits far fewer candidates than the naive share-any-shingle join
    (hot shingles sit in ~no prefixes), while staying lossless."""
    from pyspark.sql import functions as F

    from wikidata_qrank_spark.operators.dedup import (
        _shingles,
        containment_prefix_candidates,
        containment_prefix_pairs,
        overlap_coefficient_pairs,
    )
    from wikidata_qrank_spark.sources.synthetic import zipf_documents

    docs = zipf_documents(spark, n_docs=800, vocab_size=5_000, doc_len=30)
    sh = _shingles(docs, "text", 3)

    a, b = sh.alias("a"), sh.alias("b")
    naive_cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    prefix_cand = containment_prefix_candidates(sh, threshold=0.9).count()

    assert naive_cand > 1000
    assert prefix_cand < naive_cand * 0.10, (prefix_cand, naive_cand)

    naive = {
        (r.doc_a, r.doc_b): r.overlap
        for r in overlap_coefficient_pairs(docs, n=3, threshold=0.9).collect()
    }
    pref = {
        (r.doc_a, r.doc_b): r.overlap
        for r in containment_prefix_pairs(docs, n=3, threshold=0.9).collect()
    }
    assert pref == naive


def test_incremental_lsh_pairs_equals_full_rebuild(spark):
    """Batch-vs-full equivalence: candidate pairs from the standing
    band table + the new batch alone == the full-corpus rebuild's
    pairs restricted to those touching the batch."""
    from wikidata_qrank_spark.operators.dedup import (
        incremental_lsh_pairs,
        inject_near_dups,
        minhash_band_table,
        minhash_lsh_pairs,
    )

    docs = inject_near_dups(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    is_new = F.col("doc_id") % 7 == 3
    old_bands = minhash_band_table(docs.filter(~is_new))
    inc = {
        (r.doc_a, r.doc_b)
        for r in incremental_lsh_pairs(old_bands, docs.filter(is_new)).collect()
    }
    full = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs).collect()
        if r.doc_a % 7 == 3 or r.doc_b % 7 == 3
    }
    assert inc == full and len(inc) > 0


def test_incremental_lsh_history_never_shuffles(spark):
    """The scale claim made checkable: with auto-broadcast off, the
    new×old probe must STILL be a BroadcastHashJoin (the explicit
    batch-side hint) — i.e. the corpus-scale standing band table is
    consumed map-side, with no Exchange on the history side; history
    work per batch is O(batch matches), not O(corpus)."""
    from wikidata_qrank_spark.operators.dedup import (
        incremental_lsh_pairs,
        minhash_band_table,
    )

    old = spark.createDataFrame(
        [(i, "old text %d common suffix tokens here" % i) for i in range(40)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1000, "old text 7 common suffix tokens here")],
        "doc_id long, text string",
    )
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = incremental_lsh_pairs(minhash_band_table(old), new)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        got = {(r.doc_a, r.doc_b) for r in df.collect()}
        assert (7, 1000) in got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_chunk_dedup_first_occurrence_wins(spark):
    """doc 1 holds the original chunk; doc 2 repeats it twice and adds
    a fresh chunk; doc 3 repeats doc 1's chunk once. First global
    (doc_id, idx) occurrence is the survivor, everything later is a
    dup — counted per doc, partitioning-independent."""
    from wikidata_qrank_spark.operators.dedup import chunk_dedup

    a = "a b c d"          # one chunk (W=4)
    b = "x y z w"
    docs = spark.createDataFrame(
        [
            (1, a),
            (2, f"{a} {a} {b}"),   # chunks: [a, a, b] -> 2 dups
            (3, a),                 # 1 dup
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks)
        for r in chunk_dedup(docs, chunk_tokens=4).collect()
    }
    assert got == {1: (1, 0), 2: (3, 2), 3: (1, 1)}


def test_chunk_dedup_tail_chunk_and_validation(spark):
    import pytest

    from wikidata_qrank_spark.operators.dedup import chunk_dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    # 5 tokens at W=2 -> 3 chunks (the short tail "e" is its own chunk)
    row = chunk_dedup(docs, chunk_tokens=2).collect()[0]
    assert (row.n_chunks, row.n_dup_chunks) == (3, 0)
    with pytest.raises(ValueError):
        chunk_dedup(docs, chunk_tokens=0)


def test_lsh_quality_report_precision_recall(spark):
    """Exact dup pair + a weaker near-dup: at threshold 0.9 only the
    exact pair is truth, but LSH (which has no threshold) also
    surfaces the weaker pair -> precision < 1000, recall = 1000; at
    threshold 0.3 both pairs are truth -> precision recovers."""
    from wikidata_qrank_spark.operators.dedup import lsh_quality_report

    body = " ".join(f"w{i}" for i in range(40))
    weak = " ".join(f"w{i}" for i in range(36)) + " " + " ".join(
        f"z{i}" for i in range(4))
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, weak), (4, "totally different text here")],
        "doc_id long, text string",
    )
    strict = lsh_quality_report(docs, threshold=0.9,
                                hash_family="md5").collect()[0]
    assert strict.n_true == 1 and strict.n_hit == 1
    assert strict.recall_permille == 1000
    assert strict.n_candidates >= 2
    assert strict.precision_permille < 1000
    loose = lsh_quality_report(docs, threshold=0.3,
                               hash_family="md5").collect()[0]
    assert loose.n_true >= 2
    assert loose.precision_permille > strict.precision_permille
