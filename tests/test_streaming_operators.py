"""Streaming operators: watermarked windowed aggregation (late rows
dropped, windows finalized) and stateful cross-micro-batch dedup via
applyInPandasWithState (first-seen-wins, state persisted per group)."""

from __future__ import annotations

import os

import pytest

from es_indexer_spark.corpus import TRANSCRIPT_SCHEMA
from es_indexer_spark.streaming.operators import streaming_dedup, windowed_turn_counts


def _write_batch(spark, path, rows, order: int = 0):
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    # FileStreamSource orders files by modification time; stamp each batch
    # file explicitly so maxFilesPerTrigger=1 replays them in intent order
    import glob

    base = 1_700_000_000
    newest = max(glob.glob(os.path.join(path, "*.parquet")), key=os.path.getmtime)
    os.utime(newest, (base + order * 100, base + order * 100))


def _row(conv, turn, text, ts):
    import datetime as dt

    return (conv, turn, "user", text, None, dt.datetime(2024, 1, 1, 10, 0, 0)
            + dt.timedelta(minutes=ts))


def _run_stream(spark, src_dir, ckpt, transform, query_name, output_mode):
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .parquet(src_dir)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {query_name}")


def test_windowed_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: two 10-min windows' worth of turns
    _write_batch(spark, src, [
        _row("c1", 0, "a b", 1), _row("c1", 1, "c", 3),      # window 10:00-10:10
        _row("c2", 0, "d e f", 12),                           # window 10:10-10:20
    ], order=1)
    # batches 2+3: far-future rows advance the watermark past both windows
    # (the watermark takes effect one batch after the data that moves it),
    # finalizing and emitting them (append mode)
    _write_batch(spark, src, [_row("c3", 0, "x", 120)], order=2)
    _write_batch(spark, src, [_row("c4", 0, "y", 130)], order=3)
    # batch 4: a LATE row for the already-finalized first window — its
    # window end precedes the watermark, so Spark drops it on arrival
    _write_batch(spark, src, [_row("c9", 9, "late late late", 2)], order=4)
    out = _run_stream(
        spark, src, str(tmp_path / "ck"),
        lambda s: windowed_turn_counts(s, window="10 minutes", watermark="5 minutes"),
        "win_counts", "append",
    ).toPandas().sort_values("w_start").reset_index(drop=True)
    # only the two finalized windows are emitted; the late row is absent
    got = {
        (str(r["w_start"]), r["n_turns"]) for _, r in out.iterrows()
    }
    assert ("2024-01-01 10:00:00", 2) in got   # c1 turns only — late row dropped
    assert ("2024-01-01 10:10:00", 1) in got
    assert not any(r["n_turns"] == 3 for _, r in out.iterrows())


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, src, [
        _row("a", 0, "the quick fox", 0),
        _row("a", 1, "unique first", 0),
        _row("b", 0, "THE  quick   FOX", 0),  # same normalized fingerprint
    ], order=1)
    _write_batch(spark, src, [
        _row("c", 0, "the quick fox", 0),     # dup of batch 1 (cross-batch)
        _row("c", 1, "genuinely new", 0),
    ], order=2)
    out = _run_stream(
        spark, src, str(tmp_path / "ck"),
        lambda s: streaming_dedup(s, n_buckets=8),
        "dedup_out", "append",
    ).toPandas()
    # each fingerprint exactly once, first-seen wins
    assert out["fingerprint"].is_unique
    keys = set(map(tuple, out[["conv_id", "turn_idx"]].values))
    assert ("a", 0) in keys and ("a", 1) in keys and ("c", 1) in keys
    assert ("b", 0) not in keys and ("c", 0) not in keys
    assert len(out) == 3


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the dedup kernel."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.removed = False
        self.timeout_set_to = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def getCurrentWatermarkMs(self):
        return 1_000_000

    def setTimeoutTimestamp(self, ts):
        self.timeout_set_to = ts


def _dedup_pdf(texts, start=0):
    import pandas as pd

    from es_indexer_spark.streaming.operators import _DEDUP_OUT  # noqa: F401

    import hashlib

    def halves(t):
        # the production columns are the two signed-int64 halves of the
        # md5 over the normalized token stream
        h = hashlib.md5(" ".join(t.lower().split()).encode()).digest()
        return (
            int.from_bytes(h[:8], "big", signed=True),
            int.from_bytes(h[8:], "big", signed=True),
        )

    n = len(texts)
    hs = [halves(t) for t in texts]
    return pd.DataFrame(
        {
            "conv_id": [f"c{start + i}" for i in range(n)],
            "turn_idx": list(range(n)),
            "role": ["user"] * n,
            "text": list(texts),
            "tool": [None] * n,
            "_ts": pd.to_datetime(["2024-01-01"] * n),
            "fingerprint": [t for t in texts],
            "fp_hi": [h for h, _ in hs],
            "fp_lo": [lo for _, lo in hs],
        }
    )


def test_dedup_state_is_int64_and_plateaus():
    """State must be a sorted int64 array and must PLATEAU when the stream
    replays already-seen documents — the state-bound property (round-2
    VERDICT item 4): growth tracks DISTINCT docs, not stream length."""
    import numpy as np

    from es_indexer_spark.streaming.operators import _dedup_group

    st = _FakeState()
    texts = [f"doc number {i}" for i in range(50)]
    out1 = list(_dedup_group(("k",), iter([_dedup_pdf(texts)]), st))[0]
    assert len(out1) == 50
    hi, lo = np.asarray(st.get[0]), np.asarray(st.get[1])
    assert hi.dtype.kind == "i" and len(hi) == 50 == len(lo)  # full 128-bit state
    # lexsorted by (hi, lo) → the searchsorted membership fast path
    assert (np.lexsort((lo, hi)) == np.arange(50)).all()

    # replay the SAME docs 3 more times: zero new emissions, zero state growth
    for rep in range(3):
        out = list(_dedup_group(("k",), iter([_dedup_pdf(texts, start=100 * rep)]), st))[0]
        assert len(out) == 0
        assert len(st.get[0]) == 50  # plateau

    # genuinely new docs still grow it by exactly the new-distinct count
    out = list(_dedup_group(("k",), iter([_dedup_pdf(["brand new doc"])]), st))[0]
    assert len(out) == 1 and len(st.get[0]) == 51


def test_dedup_64bit_hash_collision_does_not_drop_distinct_doc():
    """Two DISTINCT documents whose fingerprints collide on the upper 64
    bits must BOTH pass (the round-4 advice finding: a 64-bit-only probe
    silently drops one forever); a true 128-bit duplicate is still
    dropped."""
    from es_indexer_spark.streaming.operators import _dedup_group

    st = _FakeState()
    a = _dedup_pdf(["doc alpha"])
    b = _dedup_pdf(["doc beta"], start=10)
    b["fp_hi"] = a["fp_hi"]  # forced hi-collision, lo differs
    assert int(b["fp_lo"][0]) != int(a["fp_lo"][0])
    out = list(_dedup_group(("k",), iter([a]), st))[0]
    assert len(out) == 1
    out = list(_dedup_group(("k",), iter([b]), st))[0]
    assert len(out) == 1  # distinct doc survives the hi-collision
    assert len(st.get[0]) == 2
    # exact 128-bit replay of either doc is still a duplicate
    out = list(_dedup_group(("k",), iter([b.copy()]), st))[0]
    assert len(out) == 0 and len(st.get[0]) == 2


def test_dedup_ttl_timeout_drops_state_and_rearms():
    from es_indexer_spark.streaming.operators import _dedup_group

    st = _FakeState()
    list(_dedup_group(("k",), iter([_dedup_pdf(["a b c"])]), st, ttl_ms=60_000))
    assert st.timeout_set_to == 1_000_000 + 60_000  # armed past the watermark
    st.hasTimedOut = True
    out = list(_dedup_group(("k",), iter([]), st, ttl_ms=60_000))[0]
    assert st.removed and len(out) == 0


def test_streaming_dedup_ttl_end_to_end(spark, tmp_path):
    """Event-time TTL: once the watermark passes a bucket's horizon its
    fingerprints are dropped, so a re-crawl far outside the dedup window
    re-emits (bounded state is the point; re-admission is the tradeoff)."""
    from es_indexer_spark.streaming.operators import streaming_dedup

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, src, [_row("a", 0, "the quick fox", 0)], order=1)
    # far-future rows advance the watermark way past bucket a's horizon
    _write_batch(spark, src, [_row("b", 0, "other text", 600)], order=2)
    _write_batch(spark, src, [_row("c", 0, "more other text", 610)], order=3)
    # same content as batch 1, re-arriving AFTER its bucket state expired
    _write_batch(spark, src, [_row("d", 0, "the quick fox", 620)], order=4)
    _write_batch(spark, src, [_row("e", 0, "closing text", 630)], order=5)
    out = _run_stream(
        spark, src, str(tmp_path / "ck"),
        lambda s: streaming_dedup(s, n_buckets=8, ttl="5 minutes"),
        "dedup_ttl_out", "append",
    ).toPandas()
    keys = set(map(tuple, out[["conv_id", "turn_idx"]].values))
    assert ("a", 0) in keys
    assert ("d", 0) in keys  # re-admitted: state for its bucket was TTL'd


def test_streaming_dedup_on_rocksdb_state_store(spark, tmp_path):
    """The operator's scale story says it runs unchanged against the
    RocksDB state store (state on executor disk, not heap). Prove the
    claim: the same cross-micro-batch dedup assertions pass with
    spark.sql.streaming.stateStore.providerClass=RocksDBStateStoreProvider
    (ships in pyspark — no extra jars)."""
    provider = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, provider)
    try:
        src = str(tmp_path / "src")
        os.makedirs(src)
        _write_batch(spark, src, [
            _row("a", 0, "the quick fox", 0),
            _row("b", 0, "THE  quick   FOX", 0),  # same normalized fingerprint
        ], order=1)
        _write_batch(spark, src, [
            _row("c", 0, "the quick fox", 0),     # cross-batch dup
            _row("c", 1, "genuinely new", 0),
        ], order=2)
        out = _run_stream(
            spark, src, str(tmp_path / "ck"),
            lambda s: streaming_dedup(s, n_buckets=8),
            "dedup_rocksdb_out", "append",
        ).toPandas()
        assert out["fingerprint"].is_unique
        keys = set(map(tuple, out[["conv_id", "turn_idx"]].values))
        assert keys == {("a", 0), ("c", 1)}
        # the query really ran on RocksDB: the checkpoint state dir carries
        # RocksDB artifacts (zip per version), not the HDFS provider's .delta
        import glob

        files = glob.glob(str(tmp_path / "ck" / "state" / "**" / "*"), recursive=True)
        assert any(f.endswith(".zip") for f in files), files[:10]
        assert not any(f.endswith(".delta") for f in files)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_sessionize_boundary_semantics(spark):
    """Boundary semantics: a silence of EXACTLY the gap still merges
    (Spark merges while ts <= last + gap); one second more breaks."""
    from es_indexer_spark.streaming.operators import sessionize

    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    data = [
        ("a", 0, "user", "t", None, base),
        ("a", 1, "user", "t", None, base + dt.timedelta(minutes=29, seconds=59)),
        ("a", 2, "user", "t", None, base + dt.timedelta(minutes=59, seconds=59)),
        # 30 min + 1 s after the previous -> NEW session (exactly 30 min
        # would still merge)
        ("a", 3, "user", "t", None, base + dt.timedelta(minutes=90, seconds=0)),
        ("b", 0, "user", "t", None, base),
    ]
    df = spark.createDataFrame(data, TRANSCRIPT_SCHEMA)
    got = sorted(
        (r["conv_id"], r["n_events"]) for r in sessionize(df, "30 minutes").collect()
    )
    assert got == [("a", 1), ("a", 3), ("b", 1)]


def test_sessionize_streaming_with_watermark(spark, tmp_path):
    """The same operator on a stream: watermark finalizes sessions whose
    window closed before it (append mode), exactly-once per session."""
    from es_indexer_spark.streaming.operators import sessionize

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, src, [
        _row("s1", 0, "a", 0), _row("s1", 1, "b", 5), _row("s2", 0, "c", 2),
    ], order=1)
    # far-future rows push the watermark past session s1/s2's horizons
    _write_batch(spark, src, [_row("s3", 0, "d", 600)], order=2)
    _write_batch(spark, src, [_row("s4", 0, "e", 700)], order=3)
    out = _run_stream(
        spark, src, str(tmp_path / "ck"),
        lambda s: sessionize(
            s.withWatermark("ts", "10 minutes"), gap="30 minutes"
        ),
        "session_out", "append",
    ).toPandas()
    got = {(r["conv_id"], r["n_events"]) for _, r in out.iterrows()}
    # the first two sessions are finalized once the watermark passes them
    assert ("s1", 2) in got and ("s2", 1) in got
