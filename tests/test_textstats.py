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
