"""Round-trip + property tests for the delta+varint posting codec."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from es_indexer_spark.codec import (
    BLOCK_SIZE,
    block_metadata,
    decode_positions,
    delta_decode,
    delta_encode_segmented,
    encode_positions,
    segmented_byte_lengths,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_basic():
    v = np.array([0, 1, 127, 128, 300, 2**14, 2**21 - 1, 2**32 - 1, 2**63], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v)), v)


def test_varint_empty():
    assert varint_encode(np.zeros(0, dtype=np.uint64)) == b""
    assert len(varint_decode(b"")) == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=500))
def test_varint_roundtrip_property(xs):
    v = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v)), v)


def test_varint_known_encoding():
    # LEB128: 300 = 0b100101100 -> 0xAC 0x02
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"


def test_delta_segmented():
    vals = np.array([3, 7, 9, 2, 2, 10], dtype=np.int64)
    seg_starts = np.array([0, 3], dtype=np.int64)  # segments [3,7,9] and [2,2,10]
    d = delta_encode_segmented(vals, seg_starts)
    assert d.tolist() == [3, 4, 2, 2, 0, 8]
    assert delta_decode(d[:3]).tolist() == [3, 7, 9]
    assert delta_decode(d[3:]).tolist() == [2, 2, 10]


def test_segmented_byte_lengths():
    vals = np.array([1, 300, 5], dtype=np.uint64)
    seg_starts = np.array([0, 2], dtype=np.int64)
    assert segmented_byte_lengths(vals, seg_starts).tolist() == [3, 1]


def test_block_metadata():
    n = 300
    docs = np.arange(0, 3 * n, 3, dtype=np.int64)
    tfn = np.linspace(0.1, 0.9, n)
    last, bmax = block_metadata(docs, tfn)
    assert len(last) == (n + BLOCK_SIZE - 1) // BLOCK_SIZE == 3
    assert last[0] == docs[127] and last[-1] == docs[-1]
    assert np.isclose(bmax[0], tfn[127])
    assert np.isclose(bmax[-1], tfn[-1])
    # ceilings dominate every member of their block (WAND validity)
    for i in range(3):
        blk = tfn[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE]
        assert bmax[i] >= blk.max()


def test_positions_roundtrip():
    per_doc = [np.array([0, 2, 5]), np.array([7]), np.array([], dtype=np.int64)]
    buf = encode_positions(per_doc)
    back = decode_positions(buf, 3)
    for a, b in zip(per_doc, back):
        assert np.array_equal(np.asarray(a), b)


# ---- property-based round-trips (hypothesis) --------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varint_roundtrip_property(values):
    arr = np.asarray(values, dtype=np.uint64)
    assert (varint_decode(varint_encode(arr)) == arr).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300),
    st.data(),
)
def test_segmented_delta_roundtrip_property(values, data):
    docs = np.unique(np.asarray(values, dtype=np.int64))
    n = len(docs)
    n_segs = data.draw(st.integers(min_value=1, max_value=max(1, n)))
    starts = np.sort(
        np.asarray(
            data.draw(
                st.lists(
                    st.integers(min_value=1, max_value=max(1, n - 1)),
                    max_size=n_segs, unique=True,
                )
            ),
            dtype=np.int64,
        )
    )
    seg_starts = np.concatenate(([0], starts)) if n > 1 else np.array([0])
    gaps = delta_encode_segmented(docs, seg_starts)
    bounds = np.append(seg_starts, n)
    out = np.concatenate(
        [delta_decode(gaps[a:b]) for a, b in zip(bounds[:-1], bounds[1:])]
    )
    assert (out == docs).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10000), min_size=1, max_size=30),
        min_size=1, max_size=40,
    )
)
def test_positions_roundtrip_property(plists):
    per_doc = [np.unique(np.asarray(p, dtype=np.int64)) for p in plists]
    buf = encode_positions(per_doc)
    out = decode_positions(buf, len(per_doc))
    for a, b in zip(out, per_doc):
        assert (a == b).all()
