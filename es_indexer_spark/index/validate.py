"""Pre-publish validation — the reference's completeness gate
(``IndexerMetadataServiceImpl.java:628-661``: indexed count must reach
>=90 % of source count before the alias switch), made stricter per the
north rule: 100 % row-count match AND per-turn text equality under stable
(conv_id, turn_idx) ordering between the source table and the indexed
document store."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ValidationError(RuntimeError):
    pass


def validate_against_source(
    spark: SparkSession, source_df: DataFrame, version_dir: str
) -> dict:
    """Compare the source transcript table with the version's doc_stats.
    Returns metrics; raises ValidationError on any mismatch."""
    src = source_df.select("conv_id", "turn_idx", "text")
    idx = (
        spark.read.parquet(os.path.join(version_dir, "doc_stats"))
        .select("conv_id", "turn_idx", "text")
    )
    n_src, n_idx = src.count(), idx.count()
    # exceptAll both ways: catches missing rows, extra rows, and any text
    # drift on matching (conv_id, turn_idx) keys in one pass each
    missing = src.exceptAll(idx).count()
    extra = idx.exceptAll(src).count()
    ok = n_src == n_idx and missing == 0 and extra == 0
    metrics = {
        "source_rows": n_src,
        "indexed_rows": n_idx,
        "rows_missing_from_index": missing,
        "rows_not_in_source": extra,
        "text_equality": ok,
    }
    if not ok:
        raise ValidationError(f"index/source divergence: {metrics}")
    return metrics
