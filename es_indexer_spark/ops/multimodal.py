"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode libraries (Pillow, ffmpeg, torchaudio, …) are NOT in this
container, so the codec step is stubbed two ways, clearly marked:

- ``decode_media`` parses a deterministic 24-byte header we synthesize —
  REAL Spark plumbing (schema, batch shape, partitioning) with a fake
  codec;
- ``decode_real`` raises NotImplementedError where the real library call
  goes.

Everything else — schemas, batched UDF signatures, feature extraction
shape, frame sampling arithmetic — is real and tested, so swapping in a
real codec is a one-function change.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"SGMM"
_HDR_FMT = "<4sBxxxiiii"  # magic, kind, w, h, sample_rate, n_frames
_HDR_SIZE = struct.calcsize(_HDR_FMT)

KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 1, 2, 3

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)

_KIND_NAME = {KIND_IMAGE: "image", KIND_AUDIO: "audio", KIND_VIDEO: "video"}


def synth_media(spark: SparkSession, n: int = 100, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table: header + pseudo-random body."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["id"].to_numpy():
                rng = np.random.default_rng(seed * 7919 + int(mid))
                kind = int(rng.integers(1, 4))
                w, h = int(rng.integers(8, 256)), int(rng.integers(8, 256))
                sr = int(rng.integers(8000, 48000)) if kind != KIND_IMAGE else 0
                nf = int(rng.integers(1, 64)) if kind == KIND_VIDEO else 1
                body = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8)
                payload = struct.pack(_HDR_FMT, _MAGIC, kind, w, h, sr, nf) + body.tobytes()
                rows.append((int(mid), _KIND_NAME[kind], payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    return spark.range(0, n).mapInPandas(gen, MEDIA_SCHEMA)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode typed metadata from the binary column (Arrow-batched).
    STUB CODEC: parses our synthetic header; a real deployment replaces
    the body of `_parse` with e.g. PIL.Image.open(BytesIO(buf))."""

    def _parse(buf: bytes):
        magic, kind, w, h, sr, nf = struct.unpack_from(_HDR_FMT, buf)
        if magic != _MAGIC:
            raise ValueError("bad media header")
        return kind, w, h, sr, nf

    def gen(batches):
        for pdf in batches:
            metas = [_parse(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "sample_rate": [m[3] or None for m in metas],
                    "n_frames": [m[4] for m in metas],
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return df.mapInPandas(gen, META_SCHEMA)


def decode_real(df: DataFrame) -> DataFrame:
    """Where the real codec goes (Pillow / ffmpeg are not installed in
    this environment)."""
    raise NotImplementedError(
        "real media decode requires Pillow/ffmpeg; use decode_media (stub codec)"
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def extract_features(df: DataFrame, bins: int = 32) -> DataFrame:
    """Deterministic fake feature extractor: normalized byte histogram of
    the payload body — REAL batch shape (one fixed-width vector per row,
    numpy over the whole Arrow batch), fake features."""

    def gen(batches):
        for pdf in batches:
            feats = []
            for buf in pdf["payload"]:
                body = np.frombuffer(buf, dtype=np.uint8, offset=_HDR_SIZE)
                hist, _ = np.histogram(body, bins=bins, range=(0, 256))
                tot = max(1, hist.sum())
                feats.append((hist / tot).astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(gen, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits (media_id, frame_idx)
    for every_n-th frame — the explode pattern a real pipeline feeds to the
    per-frame decoder. Uses decoded n_frames; no codec needed."""
    meta = decode_media(df)
    return (
        meta.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
