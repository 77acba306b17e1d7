"""Deduplication operators for training-data pipelines.

Beyond the reference's dedup (consecutive-duplicate drop in the links
writer, links.go:60-77 → exact dedup here), these are the near-dup
family a 100 TB corpus pipeline needs. All hash primitives in the
oracle-checked paths use md5 (identical in Spark and DuckDB); the
scale paths use xxhash64 (JVM-side, faster, no oracle parity needed).

Scale notes
-----------
* exact: groupBy on a 128-bit content hash — shuffles one row per doc,
  hash computed map-side; never shuffles document text.
* minhash-LSH: shingle → per-seed min-hash → band buckets → self-join
  per bucket. The only shuffle keys are (band, bucket-hash); candidate
  verification happens inside buckets, so the quadratic blowup is
  bounded by bucket size, not corpus size.
* simhash: 64-bit signature via bit-vote over token hashes; near-dup =
  signatures equal on k-of-n bands (hamming ≤ threshold by pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from ..functions.precision import round6

# ---------------------------------------------------------------- exact


def content_fingerprint(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): md5 of whitespace-normalized lowercased
    text — the document-fingerprint op (portable to the SQL oracle)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return documents.select("doc_id", F.md5(norm).alias("fingerprint"))


def exact_duplicate_groups(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(fingerprint, dup_count, doc_ids) for every group of exact
    duplicates (count > 1)."""
    fp = content_fingerprint(documents, text_col)
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dup_count"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the lowest doc_id per identical content (deterministic
    survivor, mirroring the reference's first-wins on sorted input)."""
    fp = documents.withColumn(
        "__fp",
        F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")),
    )
    w = Window.partitionBy("__fp").orderBy("doc_id")
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


# ---------------------------------------------------- shingles / jaccard


def _shingles(documents: DataFrame, text_col: str, n: int) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams per document. Built-in
    array ops only: split once per row (its own projection — a split
    captured INSIDE the transform lambda is re-evaluated for every
    gram, which made this the hidden hot spot of every shingle
    consumer; guide §1.2 "per-task work"), then transform over start
    offsets → slice+join."""
    with_toks = documents.select(
        "doc_id", F.split(F.col(text_col), " ").alias("__tk")
    )
    starts = F.sequence(F.lit(0), F.greatest(F.size("__tk") - n, F.lit(0)))
    grams = F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice("__tk", i + 1, n))
    )
    return (
        with_toks.select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def _pair_intersections(
    documents: DataFrame, text_col: str, n: int
) -> DataFrame:
    """(doc_a, doc_b, n_inter, n_a, n_b) for every document pair with a
    non-empty shingle intersection — the exact self-join frame shared
    by the Jaccard and overlap-coefficient detectors (cost ∝ Σ
    per-shingle freq²; see ngram_jaccard_pairs for the scale caveat)."""
    sh = _shingles(documents, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return inter.join(sa, "doc_a").join(sb, "doc_b")


def _candidate_intersections(sh: DataFrame, candidates: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_inter, n_a, n_b) computed ONLY for the given
    candidate pairs — the verification kernel shared by the Jaccard and
    containment scale paths.

    Round-6 shape (guide §2.3 "shuffle fewer bytes"): each doc's
    distinct-shingle set is collected into ONE array row (state bounded
    by doc length, the same bound the prefix sort already pays), the
    candidate list joins the array table once per side, and the
    intersection is a single JVM ``array_intersect`` per pair. The old
    form exploded every candidate into |shingles(doc_a)| rows and
    re-aggregated them — per-pair work is identical, but it paid two
    shuffles plus a groupBy over candidates × doc_len ROWS (2×10⁹ at
    the 50k-doc bench scale), where this moves exactly one row per
    candidate. Arrays hold the shingle STRINGS, so the count is the
    exact set intersection (no hash-collision caveat on this
    oracle-checked value path). ``sh`` is the (doc_id, shingle) frame
    from ``_shingles`` (distinct per doc by construction)."""
    arrs = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("__toks"))
    return _candidate_intersections_from_arrays(arrs, candidates)


def _candidate_intersections_from_arrays(
    arrs: DataFrame, candidates: DataFrame, assume_distinct: bool = False
) -> DataFrame:
    """Verification kernel over a prebuilt (doc_id, __toks) array table
    (``__toks`` = the doc's distinct shingles, any order). Exposed so
    the prefix joins can reuse their df-ordered per-doc arrays instead
    of re-aggregating the shingle frame. ``assume_distinct`` skips the
    defensive pair dedup when the caller's candidate stage already
    ends in ``distinct()`` — the prefix paths do, and re-deduping
    their ~10⁷-pair stream was a full extra exchange (guide §2.4)."""
    # defensive distinct: a duplicated candidate pair (e.g. a union of
    # LSH and simhash candidate sources) must not surface twice
    cand = candidates.select("doc_a", "doc_b")
    if not assume_distinct:
        cand = cand.distinct()
    a_arr = arrs.select(F.col("doc_id").alias("doc_a"), F.col("__toks").alias("__ta"))
    b_arr = arrs.select(F.col("doc_id").alias("doc_b"), F.col("__toks").alias("__tb"))
    return (
        cand.join(a_arr, "doc_a")
        .join(b_arr, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("__ta", "__tb")).cast("long").alias("n_inter"),
            F.size("__ta").cast("long").alias("n_a"),
            F.size("__tb").cast("long").alias("n_b"),
        )
        # the old exploded form only emitted pairs sharing ≥1 shingle;
        # keep the interface identical for zero-overlap candidates
        .filter(F.col("n_inter") > 0)
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with n-gram Jaccard ≥ threshold.

    Exact algorithm: |A∩B| via shingle self-join, |A∪B| = |A|+|B|−|A∩B|.
    The shingle join shuffles on the shingle string; very common
    shingles fan out quadratically, so at scale run this *after* LSH
    bucketing (minhash_lsh_pairs) — kept exact here as the verification
    kernel and the small-corpus path.
    """
    return (
        _pair_intersections(documents, text_col, n)
        .withColumn(
            "jaccard",
            round6(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def jaccard_verify_candidates(
    documents: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact n-gram Jaccard computed ONLY for
    the given candidate pairs (the verification stage of the scale dedup
    pipeline; candidates come from ``minhash_lsh_pairs``).

    Unlike the shingle self-join in :func:`ngram_jaccard_pairs` (cost ∝
    Σ per-shingle freq², quadratic on hot shingles), this joins the
    candidate list against each side's shingle set: intermediate size =
    Σ_candidates |shingles(doc_a)| — linear in candidates × doc length,
    independent of shingle popularity. Shuffle keys: doc_a, then
    (doc_b, shingle). This is the composition that holds at 100 TB.

    Pass ``shingles`` when the caller already derived the (doc_id,
    shingle) set (jaccard_prefix_pairs does) — identical subplans let
    Spark's ReuseExchange kick in instead of re-shingling the corpus.
    """
    sh = _shingles(documents, text_col, n) if shingles is None else shingles
    return (
        _candidate_intersections(sh, candidates)
        .withColumn(
            "jaccard",
            round6(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def overlap_coefficient_pairs(
    documents: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """(doc_a, doc_b, overlap) with overlap coefficient |A∩B| /
    min(|A|,|B|) ≥ threshold — the ASYMMETRIC near-dup detector:
    a short document quoted wholesale inside a long one scores ~1.0
    here while its symmetric Jaccard can be arbitrarily small (the
    containment case Jaccard-based dedup structurally misses).

    Shares the exact intersection frame with ngram_jaccard_pairs
    (_pair_intersections) — only the denominator differs. This exact
    self-join form is the small-corpus/oracle witness; the scale path
    is :func:`containment_prefix_pairs` (same pairs, no hot-shingle
    freq² term).
    """
    return (
        _pair_intersections(documents, text_col, n)
        .withColumn(
            "overlap",
            round6(F.col("n_inter") / F.least(F.col("n_a"), F.col("n_b"))),
        )
        .filter(F.col("overlap") >= threshold)
        .select("doc_a", "doc_b", "overlap")
    )


def jaccard_prefix_pairs(
    documents: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) with n-gram Jaccard ≥ threshold —
    EXACT result via prefix filtering (SSJoin/PPJoin): provably the same
    pairs as :func:`ngram_jaccard_pairs`, without its hot-shingle
    quadratic self-join.

    Under any total token order, if J(x,y) ≥ t then the first
    |d| − ⌈t·|d|⌉ + 1 tokens of each side share at least one token
    (take c* = min of the common tokens: were c* outside x's prefix,
    every common token would sit in x's ⌈t·|x|⌉−1 suffix, fewer than
    the ⌈t·|x|⌉ overlap J ≥ t forces). So joining PREFIX tokens only is
    a lossless candidate filter; exact Jaccard is then computed on
    candidates alone (:func:`jaccard_verify_candidates`).

    The order is ascending document frequency — prefixes hold each
    doc's RAREST shingles, so the popular shingles that blow up the
    naive self-join almost never enter the join at all. Cost: one
    shuffle to count shingle df, one groupBy(doc_id) to sort+slice the
    prefix (state bounded by doc length), a self-join that touches
    ~(1−t)·|d| rare tokens per doc, then the linear candidate verify.
    This is the exact-join counterpart of the minhash LSH path (which
    stays the right choice when a sketch-level recall bound suffices).
    """
    per_doc = _df_ordered_docs_checkpointed(documents, text_col, n)
    cand = _prefix_candidates(per_doc, threshold)
    return (
        _candidate_intersections_from_arrays(
            _rekeyed_arrays(per_doc),
            cand,
            assume_distinct=True,
        )
        .withColumn(
            "jaccard",
            round6(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _df_ordered_docs_checkpointed(
    documents: DataFrame, text_col: str, n: int
) -> DataFrame:
    """Eagerly materialized :func:`_df_ordered_docs` (docs×1 narrow
    array rows). The prefix-join pipelines reference the per-doc table
    FOUR times (both self-join sides + both verification sides); lazy,
    each reference re-scans the corpus, re-shingles and re-aggregates
    — measured 4× the table's build cost at the 50k-doc bench scale.
    The shingle stream is checkpointed first so the frequency count
    and the per-doc aggregation share one tokenization pass. Both
    relations are (doc, shingle)-scale — far below text size — the
    same eager-truncation rule the CC/graph loops follow."""
    sh = _shingles(documents, text_col, n).localCheckpoint(eager=True)
    return _df_ordered_docs(sh).localCheckpoint(eager=True)


def _rekeyed_arrays(per_doc: DataFrame) -> DataFrame:
    """(doc_id, __toks) verification side from a checkpointed per-doc
    table, re-keyed through one doc_id hash exchange. The exchange is
    what lets AQE see the relation's ACTUAL size at runtime and turn
    the candidate⋈arrays joins into broadcasts when it fits (a docs×1
    array dim at bench scale) — a checkpointed RDD leaf has no size
    statistics, so without it the planner falls back to sort-merge and
    ships a full array per candidate row through two shuffles. At
    production scale the same plan degrades gracefully: AQE sees an
    over-threshold exchange and keeps the shuffle join — no hint, no
    hard-coded strategy (guide §3.1)."""
    return per_doc.select("doc_id", F.col("toks").alias("__toks")).repartition(
        "doc_id"
    )


def _df_ordered_docs(sh: DataFrame) -> DataFrame:
    """(doc_id, n_sh, toks) — each doc's distinct shingles as ONE array,
    DICTIONARY-ENCODED: every shingle is replaced by its dense global
    rank ``gid`` under the ascending (document-frequency, shingle)
    total order (rank.global_row_number — two-phase, no
    single-partition sort), and ``toks`` is the doc's gid set sorted
    ascending, which IS the df order the SSJoin/PPJoin prefix lemma
    requires. The encoding is a BIJECTION (rank over distinct
    shingles), so gid-set intersections have exactly the shingle-set
    intersection size — verification stays provably exact — while the
    arrays shrink ~2.5× and ``array_intersect`` runs its specialized
    primitive-type hash set instead of per-element string hashing
    (measured 80 µs → a few µs per candidate pair at the 50k-doc
    bench scale: the single hottest kernel of the prefix join,
    round 6)."""
    from .rank import global_row_number

    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).cast("long").alias("df"))
    gids = global_row_number(
        freq, [F.col("df").asc(), F.col("shingle").asc()], rank_col="gid"
    )
    ranked = sh.join(gids.select("shingle", "gid"), "shingle")
    per_doc = ranked.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("gid")).alias("toks")
    )
    return per_doc.select("doc_id", F.size("toks").alias("n_sh"), "toks")


def _prefix_candidates(per_doc: DataFrame, threshold: float) -> DataFrame:
    """(doc_a, doc_b) pairs surviving the prefix, PPJoin length and
    PPJoin positional filters — a provably lossless superset of the
    Jaccard ≥ threshold pairs over ``per_doc`` (:func:`_df_ordered_docs`
    output).

    Filters, all with the downward epsilon (double noise in t·|d| must
    never OVER-ceil — t=0.07, |d|=100 evaluates to 7.000000000000001 →
    ceil 8 would shorten the prefix and break losslessness — and the
    output keeps pairs with round6(jaccard) ≥ t, i.e. true jaccard as
    low as t − 5e-7; erring low only admits more candidates — safe):

    * prefix (lossless): under the (df, shingle) total order, J ≥ t
      forces the first common token into BOTH prefixes of length
      |d| − ⌈t·|d|⌉ + 1 (were it outside x's prefix, all common tokens
      would sit in x's ⌈t·|x|⌉−1 suffix, fewer than the ⌈t·|x|⌉
      overlap J ≥ t forces).
    * length (lossless): J ≥ t forces t·|y| ≤ |x| ≤ |y|/t.
    * positional (lossless, round 6 — guide §2.3, prune before the
      exchange): a shared token at 1-based positions (pa, pb) of the
      df-sorted lists bounds the overlap of everything at-or-after it:
      I ≤ 1 + min(|x|−pa, |y|−pb). J ≥ t forces
      I ≥ ⌈t·(|x|+|y|)/(1+t)⌉, so join rows whose positional bound
      can't reach that are dropped. For a qualifying pair the FIRST
      common token (no shared tokens before it, so its bound is valid
      and ≥ I) always survives; later shared tokens may be pruned, and
      ``distinct`` needs any one row. Halves the candidate set on the
      dense-vocabulary bench corpus.

    The equi-join key is ``xxhash64(shingle)`` instead of the shingle
    string (narrower exchange, guide §2.3); a hash collision can only
    ADD a spurious candidate, which exact verification removes — it
    cannot lose a pair (equal strings always hash equal).
    """
    t_eps = float(threshold) - 1e-6
    n_sh = F.col("n_sh")
    alpha = F.ceil(n_sh * F.lit(t_eps))
    prefix_len = (n_sh - alpha + 1).cast("int")
    prefix = per_doc.select(
        "doc_id",
        "n_sh",
        F.posexplode(F.slice("toks", 1, prefix_len)).alias("pos0", "hkey"),
    ).select(
        "doc_id",
        "n_sh",
        (F.col("pos0") + 1).alias("pos"),
        "hkey",
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    t_lit = F.lit(t_eps)
    required = F.ceil(
        (F.col("a.n_sh") + F.col("b.n_sh")) * F.lit(t_eps / (1.0 + t_eps))
    )
    pos_bound = 1 + F.least(
        F.col("a.n_sh") - F.col("a.pos"), F.col("b.n_sh") - F.col("b.pos")
    )
    return (
        a.join(
            b,
            (F.col("a.hkey") == F.col("b.hkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n_sh") >= t_lit * F.col("b.n_sh"))
            & (F.col("b.n_sh") >= t_lit * F.col("a.n_sh"))
            & (pos_bound >= required),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_prefix_candidates(sh: DataFrame, threshold: float) -> DataFrame:
    """The candidate stage of :func:`jaccard_prefix_pairs`, exposed so
    its selectivity is testable/benchable on its own: (doc_a, doc_b)
    pairs surviving the prefix + PPJoin length + positional filters, a
    provably lossless superset of the ≥ threshold pairs. ``sh`` is the
    (doc_id, shingle) frame from ``_shingles``."""
    return _prefix_candidates(_df_ordered_docs(sh), threshold)


def containment_prefix_pairs(
    documents: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """(doc_a, doc_b, overlap) with overlap coefficient |A∩B| /
    min(|A|,|B|) ≥ threshold — EXACTLY the pairs of
    :func:`overlap_coefficient_pairs`, via a containment-adapted
    prefix filter instead of its hot-shingle freq² self-join.

    The prefix bound adapts to the min-size denominator: for a pair
    (x, y) with |x| ≤ |y|, overlap ≥ t forces |A∩B| ≥ ⌈t·|x|⌉ — a
    bound in the SMALLER side's size only. So the smaller side's
    df-ordered prefix of length |x| − ⌈t·|x|⌉ + 1 must share a token
    with y (same pigeonhole as Jaccard's prefix lemma), but — unlike
    Jaccard, where t also lower-bounds |A∩B| in |y| — nothing shortens
    the larger side: a 10-shingle doc fully quoted inside a 10 000-
    shingle doc is a hit. Hence the candidate join is ASYMMETRIC:
    prefixes of the smaller side against FULL shingle sets of
    same-or-larger docs. No PPJoin length filter exists for
    containment (any size ratio can qualify) — the size condition
    only orients the pair.

    Scale shape: per-shingle join fan-out is prefix-occurrences ×
    full-occurrences, not freq². Prefixes hold each doc's RAREST
    shingles (ascending df order), so hot shingles — the freq² killers
    — sit in ~no prefixes and generate ~no candidates; verification is
    the linear candidates-only kernel. Candidate count still exceeds
    Jaccard's prefix×prefix join (the price of detecting containment
    at all); the df ordering is what keeps it near-linear on Zipf
    vocabularies (see the selectivity pytest).
    """
    per_doc = _df_ordered_docs_checkpointed(documents, text_col, n)
    cand = _containment_candidates(per_doc, threshold)
    return (
        _candidate_intersections_from_arrays(
            _rekeyed_arrays(per_doc),
            cand,
            assume_distinct=True,
        )
        .withColumn(
            "overlap",
            round6(F.col("n_inter") / F.least(F.col("n_a"), F.col("n_b"))),
        )
        .filter(F.col("overlap") >= threshold)
        .select("doc_a", "doc_b", "overlap")
    )


def _containment_candidates(per_doc: DataFrame, threshold: float) -> DataFrame:
    """(doc_a, doc_b) candidate pairs of :func:`containment_prefix_pairs`
    over a :func:`_df_ordered_docs` table: the size-smaller doc's
    df-ordered prefix against FULL shingle lists of same-or-larger docs.

    Same downward epsilon as the Jaccard filters (never over-ceil —
    would shorten the prefix = lose pairs; the round6 output boundary
    is absorbed the same way). Round-6 additions mirroring
    :func:`_prefix_candidates`: the equi-join runs on
    ``xxhash64(shingle)`` (collisions only ADD candidates — exact
    verification removes them), and a positional filter prunes join
    rows whose best-case overlap ``1 + min(|x|−pa, |y|−pb)`` (positions
    in the shared df-sorted order) cannot reach the required
    ``⌈t·|x|⌉`` — lossless because for a qualifying pair the FIRST
    common token has no shared predecessors, so its bound is valid and
    ≥ the true overlap, and ``distinct`` needs any one surviving row.
    """
    t_eps = float(threshold) - 1e-6
    n_sh = F.col("n_sh")
    alpha = F.ceil(n_sh * F.lit(t_eps))
    prefix_len = (n_sh - alpha + 1).cast("int")
    prefix = per_doc.select(
        "doc_id",
        "n_sh",
        F.posexplode(F.slice("toks", 1, prefix_len)).alias("pos0", "hkey"),
    ).select("doc_id", "n_sh", (F.col("pos0") + 1).alias("pos"), "hkey")
    full = per_doc.select(
        "doc_id",
        "n_sh",
        F.posexplode("toks").alias("pos0", "hkey"),
    ).select("doc_id", "n_sh", (F.col("pos0") + 1).alias("pos"), "hkey")
    a = prefix.alias("a")
    b = full.alias("b")
    # orient: a is the smaller side (ties broken so each unordered pair
    # is probed exactly once from its legitimate smaller end)
    smaller = (F.col("a.n_sh") < F.col("b.n_sh")) | (
        (F.col("a.n_sh") == F.col("b.n_sh"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    required = F.ceil(F.col("a.n_sh") * F.lit(t_eps))
    pos_bound = 1 + F.least(
        F.col("a.n_sh") - F.col("a.pos"), F.col("b.n_sh") - F.col("b.pos")
    )
    return (
        a.join(
            b,
            (F.col("a.hkey") == F.col("b.hkey"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            & smaller
            & (pos_bound >= required),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .distinct()
    )


def containment_prefix_candidates(sh: DataFrame, threshold: float) -> DataFrame:
    """Candidate stage of :func:`containment_prefix_pairs`, exposed for
    selectivity tests: (doc_a, doc_b) pairs (doc_a < doc_b) where the
    size-smaller doc's prefix shares a shingle with the other doc's
    full set — a provably lossless superset of the overlap ≥ threshold
    pairs. ``sh`` is the (doc_id, shingle) frame from ``_shingles``."""
    return _containment_candidates(_df_ordered_docs(sh), threshold)


def edit_distance_pairs(
    vocab: DataFrame, token_col: str = "token", max_dist: int = 1
) -> DataFrame:
    """(tok_a, tok_b, dist) for vocabulary entries within edit distance
    1 — SymSpell-style deletion neighborhoods.

    Two strings are within Levenshtein distance 1 only if their
    1-deletion neighborhoods (the string itself plus every single-char
    deletion) intersect, so the candidate join runs on exploded
    variants — work ∝ Σ token_length, never vocab² — and exact
    ``levenshtein`` verifies candidates (the neighborhood test admits
    false positives like 'ab'/'ba'). The naive all-pairs scan the
    oracle uses is quadratic in vocab size; this is the composition
    that holds for a 100M-term vocabulary.

    Only max_dist=1 is supported (deeper distances need recursive
    deletion neighborhoods, depth = max_dist).

    Cross-engine caveat: Spark's ``levenshtein`` counts CODEPOINTS while
    DuckDB's counts BYTES, so they disagree on multi-byte tokens (中国 vs
    中文 → 1 vs 3). The operator itself is codepoint-correct; the gate
    query therefore restricts its vocabulary to ASCII (octet_length =
    length, mirrored in the oracle) so the parity check compares like
    with like.
    """
    if max_dist != 1:
        raise ValueError("edit_distance_pairs supports max_dist=1 only")
    tok = F.col(token_col)
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(tok)),
        lambda i: F.concat(
            tok.substr(F.lit(1), i - 1), tok.substr(i + 1, F.length(tok))
        ),
    )
    variants = F.array_distinct(F.concat(F.array(tok), deletions))
    # empty tokens would hit sequence(1, 0)'s negative-step default and
    # fabricate variants — exclude them (they're not vocabulary entries)
    v = vocab.select(tok.alias("token")).filter(F.length("token") > 0).distinct()
    exploded = v.select("token", F.explode(variants).alias("variant"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(b, F.col("a.variant") == F.col("b.variant"))
        .filter(F.col("a.token") < F.col("b.token"))
        .select(F.col("a.token").alias("tok_a"), F.col("b.token").alias("tok_b"))
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("tok_a", "tok_b").cast("long"))
        .filter(F.col("dist") <= max_dist)
    )


def inject_misspellings(
    vocab: DataFrame, token_col: str = "token", min_len: int = 5
) -> DataFrame:
    """Deterministic misspelling injection for gate/validation runs:
    every token of length ≥ min_len gains a last-char-dropped variant
    (edit distance 1 from its source). Mirrors the inject_near_dups /
    inject_contact pattern — the synthetic vocabulary has no organic
    near-spellings, so without injection an edit-distance check is
    vacuous; the oracle derives the identical variants."""
    tok = F.col(token_col)
    variants = vocab.filter(F.length(tok) >= min_len).select(
        tok.substr(F.lit(1), F.length(tok) - 1).alias(token_col)
    )
    return vocab.select(token_col).unionByName(variants).distinct()


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """(train_doc, bench_doc, shared_ngrams) — benchmark-leakage check:
    distinct word-n-gram overlap between training docs and a (small)
    benchmark/eval set. The bench shingle set is broadcast, so the train
    corpus is a map-side join — only matching grams reach the pair
    aggregation. At 100 TB this is the standard decontamination pass."""
    t = _shingles(train, text_col, n).withColumnRenamed("doc_id", "train_doc")
    b = _shingles(bench, text_col, n).withColumnRenamed("doc_id", "bench_doc")
    return (
        t.join(F.broadcast(b), "shingle")
        .groupBy("train_doc", "bench_doc")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


def inject_near_dups(
    documents: DataFrame,
    text_col: str = "text",
    every: int = 50,
    id_offset: int = 10_000_000,
) -> DataFrame:
    """Deterministic near-duplicate injection (gate/validation runs):
    for every doc with doc_id % every == 0, append a copy under
    doc_id + id_offset with the last two tokens dropped — Jaccard vs the
    original ≈ (T-4)/(T-2), i.e. a true near-dup. Both engines derive
    the same corpus (the oracle mirrors this expression), the same
    pattern as the PII injection: the synthetic corpus has no organic
    near-dups, so without injection an end-to-end dedup check is
    vacuous."""
    toks = F.split(F.col(text_col), " ")
    trunc = F.array_join(
        F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(1))), " "
    )
    dups = documents.filter(F.col("doc_id") % every == 0).select(
        (F.col("doc_id") + id_offset).alias("doc_id"), trunc.alias(text_col)
    )
    return documents.select("doc_id", text_col).unionByName(dups)


# --------------------------------------------------------------- minhash

DEFAULT_BANDS = 8
DEFAULT_ROWS_PER_BAND = 4  # 32 hashes total


def _seed_hash(i: int, hash_family: str):
    """Per-seed shingle hash column. 'xxhash64' (default): JVM-side
    64-bit ints, fastest. 'md5': fixed-width lowercase hex strings —
    identical in Spark and DuckDB, so the whole sketch is verifiable by
    the SQL oracle (lexicographic min on fixed-width hex == numeric min
    of the 128-bit value)."""
    if hash_family == "xxhash64":
        return F.xxhash64(F.col("shingle"), F.lit(i))
    if hash_family == "md5":
        return F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))
    raise ValueError(f"unknown hash_family: {hash_family!r}")


def minhash_signatures(
    documents: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = DEFAULT_BANDS * DEFAULT_ROWS_PER_BAND,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(doc_id, sig: array) minhash signature over word shingles.

    One ``groupBy(doc_id)`` with ``num_hashes`` min-aggregate columns:
    partial (map-side) aggregation reduces each task to one row per doc
    before the exchange, so the shuffle moves docs×1 rows — not the
    docs×num_hashes rows of the posexplode formulation (which made
    minhash the slowest bench query in round 1).

    Round-6 note (negative result, kept for the record): hashing only
    DISTINCT shingles via a vocab dim join — the count_min
    pre-aggregation trick — was tried and MEASURED SLOWER (q7 6.5→13 s,
    md5 corpus-prep 48→58 s at sf1.0): the shingle-keyed join scatters
    doc-locality, so the doc-keyed partial aggregation degrades from
    ~docs rows to ~tasks×docs rows of 32-column partials. Per-occurrence
    hashing in the doc-clustered scan pipeline is the right shape; the
    md5 family's remaining cost is inherent to its oracle-portable
    definition."""
    sh = _shingles(documents, text_col, shingle_n)
    aggs = [
        F.min(_seed_hash(i, hash_family)).alias(f"__mh{i}") for i in range(num_hashes)
    ]
    mins = sh.groupBy("doc_id").agg(*aggs)
    return mins.select(
        "doc_id", F.array(*[F.col(f"__mh{i}") for i in range(num_hashes)]).alias("sig")
    )


def _minhash_signatures_exploded(
    documents: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = DEFAULT_BANDS * DEFAULT_ROWS_PER_BAND,
) -> DataFrame:
    """Round-1 posexplode formulation, kept only as the equality witness
    for tests (same signatures, docs×num_hashes shuffle rows)."""
    sh = _shingles(documents, text_col, shingle_n)
    hashes = F.array(
        *[F.xxhash64(F.col("shingle"), F.lit(i)) for i in range(num_hashes)]
    )
    pos = sh.select("doc_id", F.posexplode(hashes).alias("i", "h"))
    mins = pos.groupBy("doc_id", "i").agg(F.min("h").alias("mh"))
    return (
        mins.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("i", "mh"))).alias("s"))
        .select(
            "doc_id", F.transform(F.col("s"), lambda x: x["mh"]).alias("sig")
        )
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH over minhash sigs.

    Signature split into ``bands`` bands of ``rows_per_band`` hashes;
    docs sharing any band bucket become a candidate pair. Shuffle key =
    (band_id, band_hash): hot buckets are real near-dup clusters, so
    skew here is signal, not pathology.

    ``hash_family='md5'`` makes the whole sketch SQL-portable (band
    bucket = md5 of the concatenated band mins) so the DuckDB oracle can
    value-check the candidate set; 'xxhash64' is the faster scale path.
    """
    banded = minhash_band_table(
        documents, text_col, shingle_n, bands, rows_per_band, hash_family
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_band_table(
    documents: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(doc_id, band, bucket) — the banded-LSH state table. This is the
    PERSISTED standing state for continuous-ingestion dedup: a doc's
    band rows depend only on its own text, so the table is append-only
    (new batch → new rows, no history rewrite) and candidate
    generation against it never re-sketches the corpus
    (:func:`incremental_lsh_pairs`). ``bands`` rows per doc."""
    sig = minhash_signatures(
        documents, text_col, shingle_n, bands * rows_per_band, hash_family
    )
    bucket_hash = F.xxhash64 if hash_family == "xxhash64" else F.md5
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        bucket_hash(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def incremental_lsh_pairs(
    old_bands: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(doc_a, doc_b) candidate near-dup pairs TOUCHING a newly arrived
    batch — continuous-ingestion dedup against standing state, without
    re-sketching history.

    Because band rows are per-doc, dedup of (old ∪ new) decomposes as
    pairs(old×old) ∪ pairs(new×(old ∪ new)); the first term was already
    emitted when history was ingested, so only the second is computed:

    * new×old — ``old_bands`` (the persisted state table, corpus-scale)
      probed MAP-SIDE against the broadcast new band rows: history
      contributes join OUTPUT rows only for matching buckets, i.e.
      shuffle/exchange work stays O(new batch), never O(corpus). The
      broadcast is by contract: a batch is ≪ the corpus (bands rows =
      batch docs × bands).
    * new×new — self-join of the batch's band rows (batch-scale).

    The caller persists ``old_bands ∪ minhash_band_table(new_docs)`` as
    the next standing state — pure append. Equivalence with the
    full-corpus rebuild is the gate key ``td_incremental_dedup``'s
    hash-checked invariant."""
    new_bands = minhash_band_table(
        new_docs, text_col, shingle_n, bands, rows_per_band, hash_family
    )
    o = old_bands.alias("o")
    nb = F.broadcast(new_bands).alias("n")
    cross = (
        o.join(
            nb,
            (F.col("o.band") == F.col("n.band"))
            & (F.col("o.bucket") == F.col("n.bucket"))
            & (F.col("o.doc_id") != F.col("n.doc_id")),
        )
        .select(
            F.least(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc_a"),
            F.greatest(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc_b"),
        )
    )
    a = new_bands.alias("a")
    b = new_bands.alias("b")
    within = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    return cross.unionByName(within).distinct()


# --------------------------------------------------------------- simhash


def simhash_signatures(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash: bigint) — 64-bit bit-vote signature over
    tokens, entirely with built-in expressions: explode tokens →
    per-bit vote ±1 via xxhash64 bit tests → sum → sign → reassemble.

    Shuffle: docs × 64 vote rows — no text movement.
    """
    toks = documents.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    h = F.xxhash64("tok")
    one = F.lit(1).cast("long")
    votes = toks.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    # bit test via shiftright to avoid 1<<63 literal overflow
                    F.when(
                        F.shiftrightunsigned(h, i).bitwiseAND(one) != 0, F.lit(1)
                    ).otherwise(F.lit(-1))
                    for i in range(64)
                ]
            )
        ).alias("bit", "vote"),
    )
    bit_sums = votes.groupBy("doc_id", "bit").agg(F.sum("vote").alias("s"))
    bits = bit_sums.select(
        "doc_id",
        # bit 63 yields Long.MIN — assemble with bitwise OR, not sum;
        # SQL shiftleft accepts a column shift amount (the F.shiftleft
        # Python wrapper only takes int)
        F.expr("CASE WHEN s > 0 THEN shiftleft(1L, bit) ELSE 0L END").alias("bitval"),
    )
    return bits.groupBy("doc_id").agg(
        F.bit_or("bitval").cast("long").alias("simhash")
    )


def simhash_near_pairs(
    documents: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup candidates with hamming(simhash) ≤ max_hamming, found by
    the pigeonhole band trick: split 64 bits into max_hamming+1 bands;
    any pair within distance shares at least one exact band. Exact
    hamming verified after the banded join (bit_count is built-in)."""
    nbands = max_hamming + 1
    width = 64 // nbands
    sig = simhash_signatures(documents, text_col)
    banded = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    for i in range(nbands)
                ]
            )
        ).alias("band", "key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _md5_bit_vote(h, i: int):
    """±1 vote for bit i (0..63) of an md5 hex column: nibble i//4
    (1-based substring), bit i%4. conv() is JVM-side; DuckDB mirrors the
    nibble with strpos('0123456789abcdef', ...)-1."""
    nib = F.conv(F.substring(h, i // 4 + 1, 1), 16, 10).cast("int")
    bit = F.shiftright(nib, i % 4).bitwiseAND(F.lit(1))
    return F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))


def simhash_band_keys(
    documents: DataFrame, text_col: str = "text", nbands: int = 4
) -> DataFrame:
    """(doc_id, k0..k{nbands-1}): SQL-portable simhash held as ``nbands``
    band keys of 64/nbands bits each instead of one 64-bit int — no
    sign-bit assembly in either engine (ANSI-safe), and the banded join
    needs exactly these keys anyway. Hash family: bits of md5(token),
    identical in Spark and DuckDB. One groupBy(doc_id) carrying 64 sum
    partials → the shuffle moves docs×1 rows."""
    width = 64 // nbands
    toks = documents.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    h = F.md5(F.col("tok"))
    sums = toks.groupBy("doc_id").agg(
        *[F.sum(_md5_bit_vote(h, i)).alias(f"__s{i}") for i in range(64)]
    )
    keys = []
    for b in range(nbands):
        expr = F.lit(0)
        for r in range(width):
            expr = expr + F.when(
                F.col(f"__s{b * width + r}") > 0, F.lit(1 << r)
            ).otherwise(F.lit(0))
        keys.append(expr.cast("long").alias(f"k{b}"))
    return sums.select("doc_id", *keys)


def simhash_near_pairs_portable(
    documents: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """(doc_a, doc_b, hamming) — same pigeonhole-band algorithm as
    ``simhash_near_pairs`` but over the md5 hash family with band-key
    representation, so the DuckDB oracle value-checks the exact output
    (pigeonhole is deterministic: every pair within ``max_hamming``
    shares ≥1 of max_hamming+1 exact bands)."""
    nbands = max_hamming + 1
    keys = simhash_band_keys(documents, text_col, nbands)
    kcols = [f"k{b}" for b in range(nbands)]
    banded = keys.select(
        "doc_id",
        *kcols,
        F.posexplode(F.array(*[F.col(k) for k in kcols])).alias("band", "key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[F.col(f"a.{k}").alias(f"a_{k}") for k in kcols],
            *[F.col(f"b.{k}").alias(f"b_{k}") for k in kcols],
        )
        .distinct()
    )
    ham = None
    for k in kcols:
        piece = F.bit_count(F.col(f"a_{k}").bitwiseXOR(F.col(f"b_{k}")))
        ham = piece if ham is None else ham + piece
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ------------------------------------------------- embedding near-dups


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 4,
    num_tables: int = 8,
    exact: bool = False,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine ≥ threshold.

    Scale path (default): hyperplane-LSH buckets generate candidates
    (same-bucket in any table), exact cosine verifies — corpus shuffles
    only on (table, bucket). ``exact=True`` switches to the full
    pairwise cross join (the verification kernel / oracle shape; O(n²),
    small inputs only).
    """
    from ..functions.precision import round6
    from .similarity import _dot, _norm, lsh_bucket

    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")).filter(
        F.col("va").isNotNull()
    )
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")).filter(
        F.col("vb").isNotNull()
    )
    if exact:
        cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        from .similarity import probe_dim

        dim = probe_dim(a, "va")
        if dim is None:
            return embeddings.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
        cand = None
        for t in range(num_tables):
            ab = a.withColumn("bucket", lsh_bucket(a, "va", nbits, t + 1, dim))
            bb = b.withColumn("bucket", lsh_bucket(b, "vb", nbits, t + 1, dim))
            pairs = ab.join(bb, "bucket").filter(F.col("id_a") < F.col("id_b")).drop("bucket")
            cand = pairs if cand is None else cand.unionByName(pairs)
        cand = cand.dropDuplicates(["id_a", "id_b"])
    scored = cand.withColumn(
        "cosine",
        round6(_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))),
    )
    return scored.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")


def chunk_dedup(
    documents: DataFrame,
    chunk_tokens: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_chunks, n_dup_chunks) — sub-document exact dedup at
    fixed token-window granularity, the scalable stand-in for CCNet's
    paragraph-hash dedup (Wenzek et al. 2020) and for exact-substring
    dedup (Lee et al. 2022) on corpora whose documents lack paragraph
    breaks: text splits into consecutive ``chunk_tokens``-token
    windows, each chunk is md5-fingerprinted, and a chunk is a DUP if
    the same fingerprint first occurs earlier in global
    (doc_id, chunk_idx) order — first occurrence survives,
    deterministically, independent of partitioning.

    Scale shape: chunk TEXT never shuffles — chunks are hashed inside
    the map-side projection and only (doc_id, idx, hash60) rows reach
    the one hash-keyed shuffle, where min_by elects the canonical
    occurrence; the verdict joins back on the SAME hash key (AQE
    reuses the exchange partitioning), then one doc-keyed count. Total
    shuffle bytes ∝ token count × ~24 bytes, no quadratic term — the
    same no-text-shuffle rule the LSH pipeline follows
    (plans/training_data.py).
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    # split once per row: a split captured inside the transform lambda
    # would re-tokenize the document for every chunk (guide §1.2)
    with_toks = documents.select(
        "doc_id", F.split(F.col(text_col), " ").alias("__tk")
    )
    n_chunks = F.ceil(F.size("__tk") / F.lit(chunk_tokens)).cast("int")
    chunk_hashes = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: hash60(
            F.array_join(
                F.slice("__tk", i * chunk_tokens + 1, chunk_tokens), " "
            )
        ),
    )
    exploded = (
        with_toks.select("doc_id", F.posexplode(chunk_hashes).alias("idx", "h"))
        .localCheckpoint(eager=True)
    )
    first = exploded.groupBy("h").agg(
        F.min(F.struct("doc_id", "idx")).alias("first_occ")
    )
    flagged = exploded.join(first, "h").select(
        "doc_id",
        (
            (F.col("first_occ.doc_id") != F.col("doc_id"))
            | (F.col("first_occ.idx") != F.col("idx"))
        ).cast("int").alias("is_dup"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("is_dup").cast("long").alias("n_dup_chunks"),
    )


def lsh_quality_report(
    documents: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """One row — (n_candidates, n_true, n_hit, precision_permille,
    recall_permille): the measured quality of the banded-LSH candidate
    generator against EXACT ground truth (every pair with n-gram
    Jaccard ≥ threshold, from the lossless prefix-filtered join). The
    "measure, don't guess" dial for the (bands, rows) sketch config:
    recall says how many true near-dup pairs the bands surface,
    precision says how much of the verify budget the false candidates
    burn — tune bands/rows until both fit, instead of trusting the
    theoretical S-curve.

    Both sides run their documented scale plans (banded buckets, never
    all-pairs; prefix-filtered truth, never the hot-shingle quadratic);
    the intersection is one (doc_a, doc_b)-keyed join; the three
    counts cross-join as 1-row broadcasts; the ratios are exact
    integer permille (NULL when a denominator is empty)."""
    # each pair set feeds its own count AND the intersection — eager
    # truncation runs each (expensive) candidate pipeline exactly once;
    # the materialized tables are just (doc_a, doc_b) pairs
    cand = (
        minhash_lsh_pairs(documents, text_col, hash_family=hash_family)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    truth = (
        jaccard_prefix_pairs(documents, text_col, threshold=threshold)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    nc = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    nh = (
        cand.join(truth, ["doc_a", "doc_b"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    return (
        nc.crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nh))
        .select(
            "n_candidates",
            "n_true",
            "n_hit",
            F.expr(
                "CASE WHEN n_candidates > 0 THEN"
                " CAST((n_hit * 1000) div n_candidates AS BIGINT) END"
            ).alias("precision_permille"),
            F.expr(
                "CASE WHEN n_true > 0 THEN"
                " CAST((n_hit * 1000) div n_true AS BIGINT) END"
            ).alias("recall_permille"),
        )
    )
