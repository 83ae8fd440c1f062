"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The native decode libraries (Pillow, ffmpeg, torchaudio, …) are NOT in
this container; the codec layer is split three ways, clearly marked:

- ``decode_real`` decodes REAL file formats stdlib-only: uncompressed
  24-bit BMP and mono PCM WAV round-trip through actual bytes
  (``encode_bmp``/``decode_bmp``, ``encode_wav``/``decode_wav``) — no
  fake headers involved;
- ``decode_media`` parses a deterministic 24-byte header we synthesize —
  REAL Spark plumbing (schema, batch shape, partitioning) with a toy
  codec, useful for exercising video metadata which has no stdlib
  format;
- compressed formats (JPEG/PNG/MP4) genuinely require native codecs and
  raise NotImplementedError inside ``decode_real``'s sniffing.

Schemas, batched UDF signatures, feature extraction shape and frame
sampling arithmetic are shared by all three paths.
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


# ---------------------------------------------------------------------------
# REAL file formats, stdlib-only: uncompressed 24-bit BMP and PCM WAV are
# fully specified header+raster/sample layouts — struct + numpy decode them
# without Pillow/ffmpeg. Compressed formats (JPEG/PNG/MP4/...) genuinely
# need native codecs and stay behind NotImplementedError.
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a real
    uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up rows, 4-byte row
    padding) — byte-identical to what any paint program would read."""
    if pixels.ndim == 2:
        pixels = np.repeat(pixels[:, :, None], 3, axis=2)
    h, w, _ = pixels.shape
    row_nbytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_nbytes), dtype=np.uint8)
    # BMP stores BGR, bottom row first
    raster[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    data = raster.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(buf: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to an (h, w, 3) RGB uint8 array."""
    magic, _, _, _, off = struct.unpack_from("<2sIHHI", buf, 0)
    if magic != b"BM":
        raise ValueError("not a BMP file")
    hsz, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", buf, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    row_nbytes = (w * 3 + 3) & ~3
    raster = np.frombuffer(buf, dtype=np.uint8, offset=off, count=h * row_nbytes)
    img = raster.reshape(h, row_nbytes)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return img[::-1] if flip else img


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode a 1-D int16 array as a real PCM WAV file (RIFF/fmt/data)."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV file to (int16 samples, sample_rate); walks the
    RIFF chunk list, so extra chunks (LIST/INFO) are tolerated."""
    riff, _, wave = struct.unpack_from("<4sI4s", buf, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a WAV file")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(buf):
        cid, sz = struct.unpack_from("<4sI", buf, pos)
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", buf, pos + 8)
            if audio_fmt != 1 or bits != 16 or channels != 1:
                raise NotImplementedError("only mono 16-bit PCM WAV")
        elif cid == b"data":
            samples = np.frombuffer(buf, dtype="<i2", offset=pos + 8, count=sz // 2)
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


def decode_real(df: DataFrame) -> DataFrame:
    """Decode REAL file formats from the binary column, stdlib-only:
    uncompressed 24-bit BMP (→ width/height) and mono PCM WAV
    (→ sample_rate/n_frames), sniffed by magic bytes. Same Arrow-batched
    ``mapInPandas`` shape and META_SCHEMA as ``decode_media``. Formats
    that need native codecs (JPEG/PNG/MP4 — Pillow/ffmpeg are not in
    this container) raise NotImplementedError per row, which surfaces as
    the task error a real pipeline would route to a quarantine sink."""

    def _meta(buf: bytes):
        if buf[:2] == b"BM":
            img = decode_bmp(buf)
            return "image", img.shape[1], img.shape[0], None, 1
        if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
            samples, rate = decode_wav(buf)
            return "audio", None, None, rate, len(samples)
        raise NotImplementedError(
            "unrecognized media format (JPEG/PNG/MP4 need Pillow/ffmpeg)"
        )

    def gen(batches):
        for pdf in batches:
            metas = [_meta(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "sample_rate": [m[3] for m in metas],
                    "n_frames": [m[4] for m in metas],
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return df.select("media_id", "payload").mapInPandas(gen, META_SCHEMA)


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
