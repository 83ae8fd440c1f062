"""Shared plan-shape policy: the one threshold that decides when a set
of ids is small enough to inline as an IN-literal (pushed into the
parquet scan) versus shipped as a broadcast-joined DataFrame (a literal
past this size bloats every serialized task plan and falls off the
pushdown path). One constant, used by tombstone masking AND the top-k
stored-fields point-read, so tuning it cannot silently diverge."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IN_LITERAL_MAX = 10_000


def mask_ordinals(
    df: DataFrame,
    ordinals,
    keep: bool,
    threshold: int = IN_LITERAL_MAX,
) -> DataFrame:
    """Filter ``df`` by a driver-side set of ``doc_ord`` values: keep only
    those (``keep=True``, the point-read) or drop them (``keep=False``,
    the tombstone mask). Small sets inline as a pushed IN-literal; larger
    sets become a broadcast (anti-)join — 8 B/ordinal, so even a million
    ids is an ~8 MB broadcast instead of a million-element literal."""
    import pandas as pd

    n = len(ordinals)
    if n == 0:
        return df if not keep else df.filter(F.lit(False))
    if n <= threshold:
        pred = F.col("doc_ord").isin([int(x) for x in ordinals])
        return df.filter(pred if keep else ~pred)
    spark = df.sparkSession
    ords_df = spark.createDataFrame(
        pd.DataFrame({"doc_ord": np.asarray(ordinals, dtype=np.int64)})
    )
    return df.join(F.broadcast(ords_df), "doc_ord", "inner" if keep else "left_anti")
