"""Triples golden — link semantics from cmd/qrank-builder/links.go:60-77
and pagelinks_test.go:17-77: dedup, self-loop removal, redirect
canonicalization through the titles∪redirects map.

The reference builds edges page→title→item; we reproduce the same edge
algebra: source pages with items, link targets resolved through titles
and redirect aliases, canonicalized, deduped, self-loops dropped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_qrank_spark.operators.linking import resolve_redirects
from wikidata_qrank_spark.operators.links import triples


def test_redirect_chain_resolution(spark):
    # chain 9→8→7→6 plus direct 17→16
    redirects = spark.createDataFrame(
        [(9, 8), (8, 7), (7, 6), (17, 16)], "alias_id long, target_id long"
    )
    df = spark.createDataFrame(
        [(1, 9), (2, 8), (3, 7), (4, 6), (5, 17), (6, 3)],
        "row long, item_id long",
    )
    got = {r.row: r.item_id for r in resolve_redirects(df, redirects).collect()}
    assert got == {1: 6, 2: 6, 3: 6, 4: 6, 5: 16, 6: 3}


def test_triples_dedup_and_self_loops(spark):
    # doc A mentions Q72,Q72,Q4022,Q72 → edges 72→4022, 4022→72
    # doc B mentions Q72,Q4022 (duplicate edge) and Q5,Q5 (self loop)
    mentions = spark.createDataFrame(
        [
            ("A", 0, 72),
            ("A", 1, 72),
            ("A", 2, 4022),
            ("A", 3, 72),
            ("B", 0, 72),
            ("B", 1, 4022),
            ("C", 0, 5),
            ("C", 1, 5),
        ],
        "doc_id string, offset int, item_id long",
    )
    got = {
        (r.subj, r.pred, r.obj)
        for r in triples(mentions).select("subj", "pred", "obj").collect()
    }
    assert got == {
        ("Q72", "links_to", "Q4022"),
        ("Q4022", "links_to", "Q72"),
    }


def test_reference_links_golden(spark):
    """pagelinks_test.go:17-77: rmwiki pagelinks joined through titles ∪
    redirects (alias Zürich→Q72), deduped, self-loops removed."""
    # page_items: page_id → item (source side)
    page_items = spark.createDataFrame(
        [(1, 72), (54, 5296), (99, 662541)], "page_id long, item_id long"
    )
    # pagelinks: from_page → target title
    pagelinks = spark.createDataFrame(
        [
            (1, "Il_Chalender_Romontsch"),  # → Q4022
            (1, "Turitg"),                  # self-link → dropped
            (1, "Laax"),                    # → Q14407
            (1, "Glion"),                   # → Q11943
            (54, "Categorias"),             # → Q17596642
            (99, "Zürich"),                 # redirect alias → Q72
            (99, "Zurigo"),                 # unknown title → dropped
        ],
        "from_page long, title string",
    )
    titles = spark.createDataFrame(
        [
            ("Turitg", 72),
            ("Il_Chalender_Romontsch", 4022),
            ("Laax", 14407),
            ("Glion", 11943),
            ("Categorias", 17596642),
        ],
        "title string, item_id long",
    )
    redirects = spark.createDataFrame([("Zürich", 72)], "title string, item_id long")
    targets = titles.unionByName(redirects)

    edges = (
        pagelinks.join(F.broadcast(page_items), pagelinks.from_page == page_items.page_id)
        .select(F.col("item_id").alias("src_id"), "title")
        .join(F.broadcast(targets.withColumnRenamed("item_id", "dst_id")), "title")
        .filter(F.col("src_id") != F.col("dst_id"))
        .dropDuplicates(["src_id", "dst_id"])
    )
    got = sorted((r.src_id, r.dst_id) for r in edges.collect())
    assert got == [
        (72, 4022),
        (72, 11943),
        (72, 14407),
        (5296, 17596642),
        (662541, 72),
    ]


def test_triple_provenance_counts_and_sample_cap(spark):
    """Three docs support edge 1->2 (dup mention in doc 7 counts
    once); sample keeps the k smallest doc ids."""
    from wikidata_qrank_spark.operators.links import triple_provenance

    mentions = spark.createDataFrame(
        [
            (7, 0, 1), (7, 1, 2), (7, 2, 1), (7, 3, 2),  # doc 7: 1->2 twice
            (3, 0, 1), (3, 1, 2),
            (9, 0, 1), (9, 1, 2),
            (9, 2, 5),                                    # 2->5 once
        ],
        "doc_id long, offset long, item_id long",
    )
    got = {(r.src_id, r.dst_id): (r.n_docs, r.sample_docs)
           for r in triple_provenance(mentions, sample_k=2).collect()}
    assert got[(1, 2)] == (3, "3,7")   # capped at the 2 smallest of {3,7,9}
    assert got[(2, 1)] == (1, "7")
    assert got[(2, 5)] == (1, "9")


def test_windowed_cooccurrence_weights_and_window(spark):
    """Doc with mention sequence a b c: window 2 gives directed pairs
    (a,b,d=1), (b,c,d=1), (a,c,d=2); weights floor(1e6/d+0.5); window 1
    reduces to adjacency."""
    from wikidata_qrank_spark.operators.links import windowed_cooccurrence

    mentions = spark.createDataFrame(
        [(1, 0, 10), (1, 5, 20), (1, 9, 30)],
        "doc_id long, offset long, item_id long",
    )
    got = {(r.src_id, r.dst_id): (r.n_cooc, r.weight_micro)
           for r in windowed_cooccurrence(mentions, window=2).collect()}
    assert got == {
        (10, 20): (1, 1000000),
        (20, 30): (1, 1000000),
        (10, 30): (1, 500000),
    }
    w1 = {(r.src_id, r.dst_id)
          for r in windowed_cooccurrence(mentions, window=1).collect()}
    assert w1 == {(10, 20), (20, 30)}
