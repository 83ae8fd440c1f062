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


# ---------------------------------------------------------------------------
# formula-image pipeline: a binary codec path with a full DuckDB oracle.
#
# Pixels are a closed-form function of (media_id, pixel index):
#   w = 8 + (id % 5)*4, h = 8 + (id % 7)*4, p[i] = (id*31 + i*7) % 256
# The Spark side BUILDS real binary payloads from the formula, then
# DECODES the bytes back (header parse + frombuffer) and block-mean
# resizes in numpy; the DuckDB oracle computes the same block means
# analytically from the formula without ever seeing a byte. A value-hash
# match proves the entire binary encode→decode→resize round trip — the
# strongest check a binary-column pipeline can get without real codecs.
# ---------------------------------------------------------------------------

IMG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("by", T.IntegerType(), False),
        T.StructField("bx", T.IntegerType(), False),
        T.StructField("mean", T.DoubleType(), False),
    ]
)


def _formula_dims(mid: int) -> tuple[int, int]:
    return 8 + (mid % 5) * 4, 8 + (mid % 7) * 4


def synth_formula_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, payload): one grayscale image per input row, pixels from
    the closed-form formula above, packed behind the standard header."""

    def gen(batches):
        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf[id_col].to_numpy(np.int64):
                w, h = _formula_dims(int(mid))
                px = ((int(mid) * 31 + np.arange(w * h, dtype=np.int64) * 7) % 256
                      ).astype(np.uint8)
                ids.append(int(mid))
                payloads.append(
                    struct.pack(_HDR_FMT, _MAGIC, KIND_IMAGE, w, h, 0, 1)
                    + px.tobytes()
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(F.col(id_col).cast("long")).mapInPandas(gen, IMG_SCHEMA)


def image_block_means(df: DataFrame, grid: int = 4) -> DataFrame:
    """Decode each binary image (header parse + frombuffer — dims read
    from the BYTES, not recomputed) and block-mean resize to grid×grid;
    emits one row per block: (media_id, by, bx, mean). Image dims must be
    multiples of ``grid`` (the formula guarantees it)."""

    def gen(batches):
        for pdf in batches:
            mids, bys, bxs, means = [], [], [], []
            for mid, buf in zip(pdf["media_id"].to_numpy(np.int64), pdf["payload"]):
                magic, kind, w, h, _, _ = struct.unpack_from(_HDR_FMT, buf)
                if magic != _MAGIC or kind != KIND_IMAGE:
                    raise ValueError("bad image header")
                img = (
                    np.frombuffer(buf, dtype=np.uint8, offset=_HDR_SIZE, count=w * h)
                    .astype(np.float64)
                    .reshape(h, w)
                )
                blocks = img.reshape(grid, h // grid, grid, w // grid).mean(axis=(1, 3))
                mids.append(np.full(grid * grid, mid, dtype=np.int64))
                bys.append(np.repeat(np.arange(grid, dtype=np.int32), grid))
                bxs.append(np.tile(np.arange(grid, dtype=np.int32), grid))
                means.append(np.round(blocks.ravel(), 6))
            if not mids:
                yield pd.DataFrame(
                    {"media_id": [], "by": [], "bx": [], "mean": []}
                ).astype({"media_id": "int64", "by": "int32", "bx": "int32",
                          "mean": "float64"})
                continue
            yield pd.DataFrame(
                {
                    "media_id": np.concatenate(mids),
                    "by": np.concatenate(bys),
                    "bx": np.concatenate(bxs),
                    "mean": np.concatenate(means),
                }
            )

    return df.mapInPandas(gen, BLOCK_SCHEMA)


def sql_image_block_means(grid: int = 4, table: str = "documents") -> str:
    """Analytic DuckDB mirror of synth_formula_images ∘ image_block_means:
    the same block means computed straight from the pixel formula."""
    return f"""
with ids as (
  select doc_id::bigint as media_id,
         8 + (doc_id % 5) * 4 as w,
         8 + (doc_id % 7) * 4 as h
  from {table}
), px as (
  select media_id, w, h, u.i as i,
         (media_id * 31 + u.i * 7) % 256 as p
  from ids, unnest(range(0, w * h)) as u(i)
)
select media_id,
       ((i // w) // (h // {grid}))::int as by,
       ((i % w) // (w // {grid}))::int as bx,
       round(avg(p), 6) as mean
from px
group by 1, 2, 3
"""


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
