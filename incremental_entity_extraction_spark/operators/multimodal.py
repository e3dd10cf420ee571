"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side machinery (schema, Arrow batch shape, partition-parallel UDFs) is
real and tested.  The actual codec step is pluggable: the default
``fake_decoder`` is a deterministic stand-in (decode libraries are not in
this container); ``strict_decoder`` raises ``NotImplementedError`` with the
integration point documented, so wiring a real libvips/ffmpeg decoder later
is a one-function swap.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image|audio|video
        T.StructField("payload", T.BinaryType(), False),   # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 32

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
        T.StructField("n_frames", T.IntegerType(), False),
        # deterministic decode metadata a real codec also emits — and the
        # half of this stage a SQL oracle CAN recompute from the persisted
        # payload (the feature vector itself is the pluggable-codec half)
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("fp", T.LongType(), False),
    ]
)


def payload_fingerprint(payload: bytes) -> int:
    """Content fingerprint of a payload, chosen for CROSS-ENGINE
    recomputability: sha256 over the lowercase-hex rendering of the bytes
    (DuckDB's sha256 takes VARCHAR only), first 15 hex chars as int64 —
    DuckDB: ``('0x'||substr(sha256(lower(hex(payload))),1,15))::BIGINT``."""
    from hashlib import sha256

    return int(sha256(payload.hex().encode()).hexdigest()[:15], 16)


def fake_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for decode + feature-extract: BLAKE2b of the
    payload expanded to FEATURE_DIM floats in [-1, 1).  Same contract as a
    real embedding extractor: bytes -> float32[FEATURE_DIM]."""
    need = FEATURE_DIM * 4
    chunks = []
    block = 0
    while need > 0:
        h = blake2b(
            payload + bytes([block]), digest_size=64, person=kind.encode()[:16]
        )
        chunks.append(h.digest())
        need -= 64
        block += 1
    raw = np.frombuffer(b"".join(chunks)[: FEATURE_DIM * 4], dtype="<i4").astype(
        np.float32
    )
    return raw / np.float32(2**31)


def strict_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Integration point for a real decoder (PIL/libvips for images,
    ffmpeg/torchaudio for audio/video).  Not available in this container."""
    raise NotImplementedError(
        "real media decoding requires image/audio libraries not present in "
        "this environment; plug a decoder with signature "
        "(payload: bytes, kind: str) -> np.ndarray[FEATURE_DIM] into "
        "extract_features(df, decoder=...)"
    )


def extract_features(
    media: DataFrame, decoder: Callable[[bytes, str], np.ndarray] = fake_decoder
) -> DataFrame:
    """mapInPandas over media rows: decode each payload per partition.

    Arrow moves the binary column zero-copy; the decoder runs batched per
    partition, so executor-side codec state (e.g. a model) initializes once
    per task like the reference's per-service model singletons."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [bytes(p) for p in pdf["payload"]]
            feats = [decoder(b, k) for b, k in zip(raw, pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [f.tolist() for f in feats],
                    "n_frames": [1] * len(pdf),
                    "n_bytes": [len(b) for b in raw],
                    "fp": [payload_fingerprint(b) for b in raw],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _extract, schema=_FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Deterministic frame sampling over video-like payloads: one 'frame'
    feature per byte-stride chunk (stand-in for ffmpeg keyframe sampling;
    the partitioning/explode shape is what a real sampler produces)."""

    frame_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n = min(max_frames, max(1, len(raw) // every_n_bytes))
                for i in range(n):
                    chunk = raw[i * every_n_bytes : (i + 1) * every_n_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    feats.append(fake_decoder(chunk, "frame").tolist())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "features": feats}
            )

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(_frames, schema=frame_schema)


def fake_decoder_2d(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for an image decode: payload bytes expanded to
    a float32 (height, width) plane in [-1, 1).  Swap for PIL/libvips via
    ``resize_images(decoder_2d=...)``."""
    need = width * height * 4
    chunks = []
    block = 0
    while need > 0:
        h = blake2b(payload + block.to_bytes(4, "little"), digest_size=64)
        chunks.append(h.digest())
        need -= 64
        block += 1
    raw = np.frombuffer(
        b"".join(chunks)[: width * height * 4], dtype="<i4"
    ).astype(np.float32) / np.float32(2**31)
    return raw.reshape(height, width)


def resize_images(
    media: DataFrame,
    out_w: int = 16,
    out_h: int = 16,
    decoder_2d: Callable[[bytes, int, int], np.ndarray] = fake_decoder_2d,
) -> DataFrame:
    """Image rows -> (media_id, out_h·out_w pixel array) at the target size.

    The decode is pluggable (faked by default — codec libs absent here);
    the RESIZE is real: vectorized nearest-neighbor index sampling per Arrow
    batch (cv2 INTER_NEAREST semantics — source pixel at
    ``floor((i + 0.5) · src/dst)``), the batch shape a real PIL/libvips
    decoder would feed.  Source dims come from ``meta.width/height``."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("out_w", T.IntegerType(), False),
            T.StructField("out_h", T.IntegerType(), False),
            T.StructField("pixels", T.ArrayType(T.FloatType()), False),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pix = [], []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                sw = int(w) if pd.notna(w) else 64
                sh = int(h) if pd.notna(h) else 64
                img = decoder_2d(bytes(payload), sw, sh)
                rr = np.minimum(
                    ((np.arange(out_h) + 0.5) * sh / out_h).astype(int), sh - 1
                )
                cc = np.minimum(
                    ((np.arange(out_w) + 0.5) * sw / out_w).astype(int), sw - 1
                )
                ids.append(mid)
                pix.append(img[np.ix_(rr, cc)].ravel().tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "out_w": out_w,
                    "out_h": out_h,
                    "pixels": pix,
                }
            )

    prepared = media.filter(F.col("kind") == "image").select(
        "media_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return prepared.mapInPandas(_resize, schema=out_schema)


def make_media_fixture(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(512, 4096)), dtype=np.uint8).tobytes()
        meta = {
            "width": 64 if kind == "image" else None,
            "height": 64 if kind == "image" else None,
            "duration_ms": 5000 if kind != "image" else None,
            "codec": {"image": "png", "audio": "opus", "video": "h264"}[kind],
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
