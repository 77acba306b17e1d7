from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wikidata_qrank_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample,
    media_table,
)
from wikidata_qrank_spark.sources.interleaved import spans
from wikidata_qrank_spark.sources.tables import load_table


def _media(spark):
    return media_table(spans(load_table(spark, SF_SMOKE, "documents")))


def test_media_table_schema_and_payload(spark):
    m = _media(spark)
    assert dict(m.dtypes)["payload"] == "binary"
    row = m.first()
    assert bytes(row.payload).decode("utf-8") == row.media_ref
    assert row.media_type in ("image/jpeg", "image/png", "audio/ogg")
    assert row.width >= 64 and row.height >= 64


def test_extract_features_shape_and_determinism(spark):
    m = _media(spark).limit(100)
    feats = extract_features(m)
    rows = feats.collect()
    assert all(len(r.feature) == FEATURE_DIM for r in rows)
    assert all(r.decoded_ok for r in rows)
    # same ref → same feature vector (stub decode is deterministic)
    again = {(r.doc_id, r.offset): r.feature for r in extract_features(m).collect()}
    for r in rows:
        assert again[(r.doc_id, r.offset)] == r.feature


def test_extract_features_tolerates_corrupt_payload(spark):
    df = spark.createDataFrame(
        [("d1", 0, "File:x.jpg", bytearray(b"abc")), ("d1", 1, "File:y.jpg", bytearray(b""))],
        "doc_id string, offset int, media_ref string, payload binary",
    )
    got = {r.offset: r.decoded_ok for r in extract_features(df).collect()}
    assert got == {0: True, 1: False}


def test_extract_features_float64_rounding(spark):
    """Features must be float64 end to end: byte 0x50 ('P') is 80/255 =
    0.3137254901…, which rounds (1e-6, half-up) to 0.313725 in float64
    but to 0.313726 through a float32 intermediate — exactly the class
    of byte the oracle's ord()/255.0 check would catch."""
    df = spark.createDataFrame(
        [("d1", 0, "PPPPPPPP", bytearray(b"PPPPPPPP"))],
        "doc_id string, offset int, media_ref string, payload binary",
    )
    feats = extract_features(df)
    assert dict(feats.dtypes)["feature"] == "array<double>"
    row = feats.first()
    import math

    for v in row.feature:
        assert math.floor(v * 1e6 + 0.5) / 1e6 == 0.313725


def test_frame_sample_keeps_every_nth(spark):
    m = _media(spark)
    sampled = frame_sample(m, every_nth=3)
    per_doc = m.groupBy("doc_id").count().withColumnRenamed("count", "total")
    per_doc_s = sampled.groupBy("doc_id").count().withColumnRenamed("count", "kept")
    joined = per_doc.join(per_doc_s, "doc_id").collect()
    for r in joined:
        assert r.kept == (r.total + 2) // 3


def test_resize_media_plumbing(spark):
    """Resize pass: metadata rewritten to target dims, payload bounded,
    corruption tolerated (empty payload → resized_ok=False)."""
    import pandas as pd

    from wikidata_qrank_spark.operators.multimodal import resize_media

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["1", "2"],
                "offset": [3, 10],
                "media_ref": ["File:a.jpg", "File:b.jpg"],
                "payload": [b"x" * 500, b""],
                "media_type": ["image/jpeg", "image/png"],
            }
        )
    )
    rows = {r.doc_id: r for r in resize_media(media, width=32, height=16).collect()}
    assert rows["1"].resized_ok and len(rows["1"].payload) == 48
    assert rows["1"].width == 32 and rows["1"].height == 16
    assert not rows["2"].resized_ok and rows["2"].payload == b""


def test_media_ahash_properties(spark):
    """aHash: identical payloads get identical hashes; the hash matches
    a Python recomputation of bit_i = feature_i > mean."""
    from wikidata_qrank_spark.operators.multimodal import (
        extract_features,
        media_ahash,
        media_table,
    )

    spans_df = spark.createDataFrame(
        [
            ("1", 0, "media", None, "img_alpha.jpg"),
            ("2", 1, "media", None, "img_alpha.jpg"),  # same payload
            ("3", 2, "media", None, "other_clip.ogg"),
        ],
        "doc_id string, offset int, kind string, text string, media_ref string",
    )
    feats = extract_features(media_table(spans_df))
    rows = {r.doc_id: r.ahash for r in media_ahash(feats).collect()}
    assert rows["1"] == rows["2"]

    def ahash(ref):
        raw = ref.encode()
        f = [(raw[i % len(raw)]) / 255.0 for i in range(8)]
        mu = sum(f) / 8.0
        return sum(1 << i for i, x in enumerate(f) if x > mu)

    assert rows["1"] == ahash("img_alpha.jpg")
    assert rows["3"] == ahash("other_clip.ogg")


def test_real_pil_decode_when_available(spark):
    """With PIL installed the decode dispatcher takes the real path for
    genuinely decodable payloads (the synthetic gate payloads always
    fall back to the stand-in, keeping mm_* hashes PIL-invariant).
    Skipped in this sandbox (no PIL)."""
    import pytest

    from wikidata_qrank_spark.operators import multimodal as mm

    if mm._PILImage is None:
        pytest.skip("PIL not installed in this environment")

    import io

    import numpy as np

    img = mm._PILImage.new("L", (16, 16), color=128)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    feat = mm._decode(buf.getvalue())
    assert feat.shape == (mm.FEATURE_DIM,)
    assert np.allclose(feat, 128 / 255.0)


def test_decode_dispatcher_falls_back_on_text_payload():
    """Synthetic payloads (utf-8 media refs) are not decodable images:
    with or without PIL, _decode must equal the deterministic stand-in,
    which is what keeps the mm_* gate hashes environment-invariant."""
    import numpy as np

    from wikidata_qrank_spark.operators import multimodal as mm

    payload = "File:Station_plan.svg".encode()
    assert np.array_equal(mm._decode(payload), mm._fake_decode(payload))


def test_ahash_near_groups_flip_probe(spark):
    """Hash values 0b0001 and 0b0011 differ in one bit -> paired with
    their group counts; 0b1100 is >=2 flips from both -> absent; each
    pair appears once (a < b guard)."""
    from wikidata_qrank_spark.operators.multimodal import ahash_near_groups

    hashes = spark.createDataFrame(
        [(1,), (1,), (3,), (12,), (12,), (12,)],
        "ahash long",
    )
    got = {(r.hash_a, r.hash_b): (r.n_a, r.n_b)
           for r in ahash_near_groups(hashes, bits=4).collect()}
    # only (1,3) at hamming 1; 12's flips are {13,14,8,4}, none present
    assert got == {(1, 3): (2, 1)}
