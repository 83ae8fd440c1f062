"""Structured Streaming operators beyond the incremental-index sink:
watermarked windowed aggregation and stateful streaming deduplication.

The reference has no stream processing (SURVEY §2.10) — these are the
operators a transcript firehose needs in front of the indexer:

- ``windowed_turn_counts``: event-time tumbling-window counts with a
  watermark bounding late data — the canonical
  readStream → withWatermark → window/groupBy shape. State is bounded:
  Spark drops windows older than the watermark.
- ``streaming_dedup``: exact-dedup across micro-batches via
  ``applyInPandasWithState``: keyed by a fingerprint bucket, per-group
  state holds the set of fingerprints already emitted, and only
  first-seen documents pass through. This is the stateful front gate
  that keeps re-crawled/replayed documents from re-entering the index
  (batch analogue: ``ops/dedup.exact_duplicates``). Bucketing the key
  space (crc32 % n_buckets) bounds per-group state and spreads it over
  the cluster; at 10^9 docs/state too large for memory, the same
  operator runs against RocksDB state store — the plumbing is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..index.build import term_bucket_col


def windowed_turn_counts(
    stream_df: DataFrame,
    window: str = "10 minutes",
    watermark: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(window, role) turn counts with event-time watermarking: rows
    later than ``watermark`` behind the max seen event time are dropped
    and completed windows are finalized (append-mode emittable)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col("role"))
        .agg(F.count("*").alias("n_turns"), F.sum(F.length("text")).alias("chars"))
        .select(
            F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"),
            "role", "n_turns", "chars",
        )
    )


_DEDUP_OUT = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("fingerprint", T.StringType()),
    ]
)
_DEDUP_STATE = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])


def _dedup_group(key, pdfs, state: GroupState):
    import pandas as pd

    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdfs:
        fresh = pdf[~pdf["fingerprint"].isin(seen) & ~pdf["fingerprint"].duplicated()]
        seen.update(fresh["fingerprint"])
        out.append(fresh[["conv_id", "turn_idx", "fingerprint"]])
    state.update((list(seen),))
    yield pd.concat(out, ignore_index=True)


def streaming_dedup(stream_df: DataFrame, n_buckets: int = 64) -> DataFrame:
    """First-seen-wins streaming dedup: content fingerprint (md5 over the
    normalized token stream, the same key as the batch exact-dedup) →
    bucketed ``applyInPandasWithState``; duplicates are filtered within
    AND across micro-batches (state persists in the streaming checkpoint,
    so replays stay exactly-once)."""
    toks = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(r"[\p{L}\p{N}]+"), 0
    )
    fp = stream_df.select(
        "conv_id", "turn_idx",
        F.md5(F.concat_ws(" ", toks)).alias("fingerprint"),
    ).withColumn("bucket", term_bucket_col(n_buckets, "fingerprint"))
    return fp.groupBy("bucket").applyInPandasWithState(
        _dedup_group,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
