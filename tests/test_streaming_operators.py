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
