"""Posting-list compression: delta + varint (FOR/PForDelta-style) with
per-block maxima — fully vectorized numpy, no per-element Python loops.

This is the Lucene postings-format layer the reference delegates to
Elasticsearch (every ``"type": "text"`` field in
``stacmodel/src/main/resources/schema/portal_records_index_schema.json``
implies an inverted index with compressed postings + skip data). We encode:

- doc gaps:  sorted local doc ordinals → first value absolute, rest deltas,
  LEB128 varint bytes;
- tfs:       varint;
- positions: per-doc position deltas, varint (optional);
- block-max: per BLOCK_SIZE=128 postings, the maximum BM25 tf-norm
  ``tf / (tf + k1*(1-b + b*dl/avgdl))`` and the last doc id of the block —
  the skip+ceiling metadata block-max WAND needs.

Encode/decode are segment-aware: a whole shard's postings (all terms) are
encoded in ONE vectorized pass and sliced per term by byte offsets.

Format lineage (public literature): delta gaps + variable-byte coding as
in Scholer et al. "Compression of inverted indexes for fast query
evaluation" (SIGIR 2002); the per-block layout and skip/ceiling metadata
follow Lucene's postings format and Ding & Suel's block-max indexes
(SIGIR 2011); FOR/PForDelta bit-packing (Zukowski et al., ICDE 2006) is
the documented upgrade path if varint becomes the bottleneck.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
_MAX_VARINT_BYTES = 10  # uint64 worst case


def _varint_nbytes(values: np.ndarray) -> np.ndarray:
    """Bytes each uint64 value needs in LEB128."""
    v = values.astype(np.uint64, copy=False)
    nb = np.ones(len(v), dtype=np.int64)
    for k in range(1, _MAX_VARINT_BYTES):
        nb += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    return nb


def varint_nbytes(values: np.ndarray) -> np.ndarray:
    """Public alias: per-value LEB128 byte counts (for segmented slicing)."""
    return _varint_nbytes(np.asarray(values, dtype=np.uint64))


def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64 array."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b""
    nb = _varint_nbytes(v)
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for j in range(int(nb.max())):
        mask = nb > j
        byte = (v[mask] >> np.uint64(7 * j)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << 7
        out[starts[mask] + j] = byte.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Vectorized LEB128 decode → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    last = (b & 0x80) == 0
    value_id = np.zeros(len(b), dtype=np.int64)
    np.cumsum(last[:-1], out=value_id[1:])
    starts = np.flatnonzero(np.concatenate(([True], last[:-1])))
    pos_in_val = np.arange(len(b), dtype=np.int64) - starts[value_id]
    vals = np.zeros(int(last.sum()), dtype=np.uint64)
    np.bitwise_or.at(
        vals,
        value_id,
        (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos_in_val).astype(np.uint64),
    )
    return vals


def segmented_byte_lengths(values: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Total varint byte length of each segment; seg_starts includes 0 and
    excludes the end sentinel (np.add.reduceat semantics)."""
    if len(values) == 0:
        return np.zeros(len(seg_starts), dtype=np.int64)
    return np.add.reduceat(_varint_nbytes(values), seg_starts)


def delta_encode_segmented(values: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Per-segment delta encode: first element of each segment stays
    absolute, subsequent elements become gaps. Vectorized across all
    segments at once."""
    v = values.astype(np.int64, copy=True)
    if len(v) == 0:
        return v.astype(np.uint64)
    d = np.empty_like(v)
    d[0] = v[0]
    d[1:] = v[1:] - v[:-1]
    d[seg_starts] = v[seg_starts]  # reset at segment boundaries
    return d.astype(np.uint64)


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    """Inverse of per-segment delta encode for a SINGLE segment."""
    return np.cumsum(deltas.astype(np.int64)).astype(np.int64)


def delta_decode_multi(deltas: np.ndarray, run_starts: np.ndarray) -> np.ndarray:
    """Inverse of per-segment delta encode for MANY concatenated runs at
    once (each run's first value absolute). Vectorized: within run r the
    value is cumsum(deltas)[i] - cumsum(deltas)[start_r - 1]."""
    d = deltas.astype(np.int64)
    if len(d) == 0:
        return d
    cs = np.cumsum(d)
    base = np.zeros(len(run_starts), dtype=np.int64)
    base[1:] = cs[run_starts[1:] - 1]
    run_lens = np.diff(np.append(run_starts, len(d)))
    return cs - np.repeat(base, run_lens)


def block_metadata(
    local_docs: np.ndarray,
    tf_norm: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block (last local doc id, max tf-norm) for one term's postings.

    ``tf_norm`` is the idf-free BM25 document factor
    ``tf / (tf + k1*(1-b+b*dl/avgdl))``; WAND multiplies the global idf and
    query-side boosts on top, so these ceilings stay valid for any boost set.
    """
    n = len(local_docs)
    n_blocks = (n + block_size - 1) // block_size
    last = np.empty(n_blocks, dtype=np.uint32)
    bmax = np.empty(n_blocks, dtype=np.float64)
    ends = np.minimum(np.arange(1, n_blocks + 1) * block_size, n)
    starts = np.arange(n_blocks) * block_size
    last[:] = local_docs[ends - 1]
    bmax[:] = np.maximum.reduceat(tf_norm, starts)
    return last, bmax


def encode_positions(positions_per_doc: list[np.ndarray]) -> bytes:
    """Positional postings for one term in one doc run:
    per doc ``[npos, pos_delta_0(absolute), pos_delta_1, ...]`` varint."""
    parts: list[np.ndarray] = []
    for pos in positions_per_doc:
        p = np.asarray(pos, dtype=np.int64)
        d = np.empty(len(p) + 1, dtype=np.uint64)
        d[0] = len(p)
        if len(p):
            d[1] = p[0]
            d[2:] = (p[1:] - p[:-1]).astype(np.uint64)
        parts.append(d)
    if not parts:
        return b""
    return varint_encode(np.concatenate(parts))


def decode_positions(buf: bytes, n_docs: int) -> list[np.ndarray]:
    """Inverse of :func:`encode_positions`."""
    flat = varint_decode(buf).astype(np.int64)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(n_docs):
        npos = int(flat[i])
        deltas = flat[i + 1 : i + 1 + npos]
        out.append(np.cumsum(deltas))
        i += 1 + npos
    return out
