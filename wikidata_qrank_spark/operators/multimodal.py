"""Multimodal column plumbing: image/audio/video as opaque binary.

The container has no image/audio libraries, so the *decode* kernels are
stubbed behind a deterministic fake (clearly marked); everything
Spark-side — schema, Arrow batch shape, partitioning, UDF signatures —
is real and tested. A production deployment swaps `_fake_decode` for
PIL/ffmpeg inside the same mapInPandas kernel.

Media payloads are derived from media spans: payload bytes = the
media_ref utf-8 encoded (deterministic stand-in for real file bytes),
with typed metadata (media_type, width, height) synthesized from a hash
of the ref — stable across runs and engines.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, offset int, media_ref string, payload binary, "
    "media_type string, width int, height int"
)

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id string, offset int, media_ref string, "
    "feature array<double>, decoded_ok boolean"
)


def media_table(spans_df: DataFrame) -> DataFrame:
    """Typed media table from media spans: binary payload + metadata.

    Width/height are deterministic functions of the ref hash —
    placeholder metadata with the real schema.
    """
    m = spans_df.filter(F.col("kind") == "media").select(
        "doc_id", "offset", "media_ref"
    )
    h = F.abs(F.xxhash64("media_ref"))
    return m.select(
        "doc_id",
        "offset",
        "media_ref",
        F.encode("media_ref", "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image/jpeg"), F.lit("image/png"), F.lit("audio/ogg")),
            (h % 3 + 1).cast("int"),
        ).alias("media_type"),
        (64 + h % 1024).cast("int").alias("width"),
        (64 + (h / 7).cast("long") % 1024).cast("int").alias("height"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB — deterministic fake for the image/audio decoder.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload))
    → resize → np.asarray. Not available in this container, so derive a
    FEATURE_DIM float vector from the payload bytes. Raises on empty
    payload the way a real decoder raises on truncated files.

    float64 end-to-end: the feature is byte/255.0 and downstream gate
    checks round to 1e-6 — a float32 intermediate truncates bytes like
    0x50 (80/255) to 0.31372549_f32, which rounds to 0.313726 while the
    float64 oracle value rounds to 0.313725.
    """
    if not payload:
        raise ValueError("empty media payload")
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    reps = -(-FEATURE_DIM // len(arr))
    return np.resize(np.tile(arr, reps), FEATURE_DIM) / 255.0


def extract_features(media_df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, per-row decode
    with failure tolerance (decoded_ok=False instead of task failure —
    a 100 TB corpus always contains corrupt media)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(_fake_decode(bytes(payload)).tolist())
                    oks.append(True)
                except (ValueError, TypeError):
                    feats.append([0.0] * FEATURE_DIM)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "offset": pdf["offset"],
                    "media_ref": pdf["media_ref"],
                    "feature": feats,
                    "decoded_ok": oks,
                }
            )

    return media_df.select("doc_id", "offset", "media_ref", "payload").mapInPandas(
        kernel, schema=FEATURES_SCHEMA
    )


def frame_sample(media_df: DataFrame, every_nth: int = 5) -> DataFrame:
    """Frame-sampling analog: keep every Nth media span per document by
    offset order — pure built-ins (row_number over doc windows)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("offset")
    return (
        media_df.withColumn("__seq", F.row_number().over(w))
        .filter((F.col("__seq") - 1) % every_nth == 0)
        .drop("__seq")
    )


RESIZED_SCHEMA = (
    "doc_id string, offset int, media_ref string, payload binary, "
    "media_type string, width int, height int, resized_ok boolean"
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """STUB — deterministic fake for the image resize kernel (no PIL in
    this container; production swaps in Image.open → resize → tobytes
    inside the same mapInPandas kernel). Derives a byte payload of
    length min(len, width+height) so downstream size accounting is
    exercised; raises on empty payload like a real decoder."""
    if not payload:
        raise ValueError("empty media payload")
    return payload[: max(1, min(len(payload), width + height))]


def resize_media(media_df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """mapInPandas resize pass: Arrow batches in, per-row resize with
    corruption tolerance (resized_ok=False keeps the original payload
    instead of failing the task). The Spark-side plumbing — schema,
    batching, metadata rewrite — is real; only the pixel kernel is the
    documented stub."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, oks = [], []
            for payload in pdf["payload"]:
                try:
                    out_payload.append(_fake_resize(bytes(payload), width, height))
                    oks.append(True)
                except (ValueError, TypeError):
                    out_payload.append(bytes(payload) if payload is not None else b"")
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "offset": pdf["offset"],
                    "media_ref": pdf["media_ref"],
                    "payload": out_payload,
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "resized_ok": oks,
                }
            )

    return media_df.select(
        "doc_id", "offset", "media_ref", "payload", "media_type"
    ).mapInPandas(kernel, schema=RESIZED_SCHEMA)


def media_ahash(features_df: DataFrame) -> DataFrame:
    """(doc_id, offset, media_ref, ahash) — perceptual average-hash
    over the decoded feature vector: bit i set iff feature_i is above
    the vector mean. THE media dedup key: byte-identical payloads and
    perceptually-close variants land in the same (or hamming-near)
    bucket, and the downstream join is exactly the exact-dedup /
    simhash machinery already in operators/dedup.py, applied to a
    binary column.

    Built-in array ops over the already-extracted features (JVM-side);
    the mean and the bit fold are LEFT folds so the oracle's
    list_reduce reproduces the float path bit-for-bit. A real pHash
    (DCT of a decoded image) swaps into _fake_decode's slot — the hash
    derivation here is decoder-agnostic."""
    mu = F.aggregate(
        F.col("feature"), F.lit(0.0), lambda a, x: a + x
    ) / F.size("feature")
    ah = F.expr(
        """
        aggregate(
          zip_with(feature, sequence(0, size(feature) - 1),
                   (x, i) -> CASE WHEN x > __mu
                             THEN shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))
                             ELSE CAST(0 AS BIGINT) END),
          CAST(0 AS BIGINT), (a, x) -> a + x)
        """
    )
    return (
        features_df.withColumn("__mu", mu)
        .withColumn("ahash", ah)
        .select("doc_id", "offset", "media_ref", "ahash")
    )
