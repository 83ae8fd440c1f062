"""Corpus-side sinks: size-capped partitioned parquet for curated
training sets and a dead-letter writer for quarantined records.

The reference's bulk sink caps batches at ~5 MiB and retries until the
write lands (``IndexServiceImpl.java:37-134,152-155``); the lakehouse
rendering is a parquet write with bounded records-per-file (so no task
emits a multi-GB file and downstream readers get uniform splits),
partitioned by the curation dimensions, idempotent via
``mode=overwrite`` of the target directory. Appends compose with the
dead-letter convention from ``sources.readers``: bad rows land next to
the data with their reason, never silently dropped."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    max_records_per_file: int = 250_000,
    mode: str = "overwrite",
) -> None:
    """Write a (curated) corpus as parquet with a per-file record cap —
    the size-capped batch sink (S5) at corpus granularity. The cap rides
    Spark's native ``maxRecordsPerFile`` (enforced inside the writer, no
    extra shuffle); partition columns give partition-pruned reads on the
    curation dimensions."""
    w = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_dead_letter(
    bad: DataFrame,
    path: str,
    batch_id: int | None = None,
) -> None:
    """Append quarantined rows (raw record + reason) with an audit
    timestamp column. The layout is uniformly hive-partitioned by a
    string ``batch`` key — epoch writes go to ``batch=<epoch>`` with
    overwrite (replays stay idempotent, the incremental sink's
    convention) and ad-hoc writes append under ``batch=adhoc`` — so
    mixing the two modes on one path never produces the 'conflicting
    directory structures' layout parquet readers refuse to load.
    (A DLQ populated by a pre-hive flat layout should get a fresh
    path — mixing old root-level files with batch= dirs is the same
    conflict.)"""
    out = bad.withColumn("quarantined_at", F.current_timestamp())
    if batch_id is not None:
        out.write.mode("overwrite").parquet(f"{path}/batch={int(batch_id)}")
    else:
        out.write.mode("append").parquet(f"{path}/batch=adhoc")
