"""Multimodal column plumbing: image/audio/video as opaque binary.

The decode kernels are gated on an optional PIL import: environments
with codecs decode/resize real images inside the same mapInPandas
kernels, while payloads PIL can't parse (including every synthetic gate
payload — utf-8 text bytes) fall back to a deterministic stand-in
(clearly marked), so the mm_* gate hashes are identical with and
without PIL. Everything Spark-side — schema, Arrow batch shape,
partitioning, UDF signatures — is real and tested either way.

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


try:  # optional real codec: sandbox has no PIL, production may
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None


def _pil_decode(payload: bytes) -> np.ndarray:
    """Real image decode (only reachable when PIL is installed):
    grayscale → FEATURE_DIM×1 resize → normalized float64 vector, the
    same feature contract as the stand-in."""
    import io

    img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((FEATURE_DIM, 1))
    return np.asarray(img, dtype=np.float64).reshape(FEATURE_DIM) / 255.0


def _decode(payload: bytes) -> np.ndarray:
    """Decode dispatcher: with PIL installed, genuinely decodable
    payloads take the real path; anything PIL rejects (including every
    synthetic gate payload, which is utf-8 text bytes) falls back to
    the deterministic stand-in — so the mm_* gate hashes are identical
    with and without PIL in the environment."""
    if not payload:
        raise ValueError("empty media payload")
    if _PILImage is not None:
        try:
            return _pil_decode(payload)
        except Exception:
            pass
    return _fake_decode(payload)


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
                    feats.append(_decode(bytes(payload)).tolist())
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
    """STUB — deterministic fake for the image resize kernel. Derives a
    byte payload of length min(len, width+height) so downstream size
    accounting is exercised; raises on empty payload like a real
    decoder."""
    if not payload:
        raise ValueError("empty media payload")
    return payload[: max(1, min(len(payload), width + height))]


def _resize(payload: bytes, width: int, height: int) -> bytes:
    """Resize dispatcher, same gating contract as :func:`_decode`: PIL
    path for genuinely decodable payloads when PIL is installed,
    deterministic stand-in otherwise — gate hashes are PIL-invariant."""
    if not payload:
        raise ValueError("empty media payload")
    if _PILImage is not None:
        import io

        # the whole PIL path is guarded: Image.open is lazy (header
        # only), so truncated bodies surface later in resize()/save()
        # — any failure falls back to the stand-in, preserving the
        # kernel's corruption tolerance
        try:
            img = _PILImage.open(io.BytesIO(payload))
            buf = io.BytesIO()
            img.resize((width, height)).save(buf, format=img.format or "PNG")
            return buf.getvalue()
        except Exception:
            return _fake_resize(payload, width, height)
    return _fake_resize(payload, width, height)


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
                    out_payload.append(_resize(bytes(payload), width, height))
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


def ahash_near_groups(ahash_df: DataFrame, bits: int = 8) -> DataFrame:
    """(hash_a, hash_b, n_a, n_b) — pairs of DISTINCT perceptual-hash
    values at Hamming distance exactly 1, each with its media count:
    the merge candidates for near-duplicate media groups (exact-hash
    groups are the base clusters; Hamming-1 adjacency says which
    clusters are perceptually the same asset re-encoded).

    The scale trick is the flip probe: instead of a quadratic
    hash×hash comparison, every distinct value explodes its ``bits``
    one-bit flips map-side and EQUI-joins them against the value table
    — work is O(distinct values × bits), keyed, with the a < b guard
    emitting each pair once. Operating on VALUE space (distinct hashes
    + counts), not instance space, keeps hot assets (a million copies
    of one logo) as one row."""
    if bits < 1:
        raise ValueError(f"bits must be >= 1, got {bits}")
    counts = ahash_df.groupBy("ahash").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    flips = counts.select(
        F.col("ahash").alias("hash_a"),
        F.col("n").alias("n_a"),
        F.explode(
            F.array(*[F.expr(f"ahash ^ CAST({1 << i} AS BIGINT)") for i in range(bits)])
        ).alias("hash_b"),
    )
    return (
        flips.filter(F.col("hash_a") < F.col("hash_b"))
        .join(
            counts.select(
                F.col("ahash").alias("hash_b"), F.col("n").alias("n_b")
            ),
            "hash_b",
        )
        .select("hash_a", "hash_b", "n_a", "n_b")
    )
