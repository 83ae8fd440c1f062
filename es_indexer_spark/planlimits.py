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


def drop_ordinals(
    df: DataFrame,
    ordinals,
    threshold: int = IN_LITERAL_MAX,
) -> DataFrame:
    """Drop a driver-side set of ``doc_ord`` values from ``df`` (the
    tombstone mask). Small sets inline as a pushed NOT-IN literal; larger
    sets become a broadcast anti-join — 8 B/ordinal, so even a million
    ids is an ~8 MB broadcast instead of a million-element literal. (The
    stored-fields point-read shares only the THRESHOLD: its keep-side
    join already exists as the score join, so no keep variant lives
    here.)"""
    import pandas as pd

    n = len(ordinals)
    if n == 0:
        return df
    if n <= threshold:
        return df.filter(~F.col("doc_ord").isin([int(x) for x in ordinals]))
    spark = df.sparkSession
    ords_df = spark.createDataFrame(
        pd.DataFrame({"doc_ord": np.asarray(ordinals, dtype=np.int64)})
    )
    return df.join(F.broadcast(ords_df), "doc_ord", "left_anti")
