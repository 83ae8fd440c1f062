"""Sequence packing: assign documents to fixed-token-budget training
packs ("concat-and-chunk", the standard LLM-pretraining batching scheme —
documents are concatenated in a stable global order and the token stream
is cut every ``budget`` tokens; each document belongs to the pack where
its first token lands).

The primitive underneath is a GLOBAL running token total in key order —
which must NOT be a Spark window over an unpartitioned ORDER BY (that
plan funnels the whole table through one task). Instead this is the
classic two-pass distributed prefix sum:

  1. range-partition by key, sort within partitions (one shuffle of two
     long columns per row — the text never moves);
  2. per-partition token totals → driver (P rows, P = #partitions, i.e.
     bytes, not data) → exclusive prefix over partition ids, which range
     partitioning guarantees are in key order;
  3. second pass adds the partition offset to the partition-local running
     sum — embarrassingly parallel.

The narrow (key, n_tokens) projection is persisted between the two
passes so both see the identical partitioning. At 10^12 turns the
persisted slice is two int64 lanes — tiny next to the corpus."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import SQL_TOKENS, tokens_col


def pack_sequences(
    df: DataFrame,
    budget: int,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, pack_id): pack_id = (tokens before this doc) // budget
    over the key-ordered token stream."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    spark = df.sparkSession
    n_parts = max(2, spark.sparkContext.defaultParallelism)
    narrow = (
        df.select(
            F.col(key).alias("id").cast("long"),
            F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
        )
        .repartitionByRange(n_parts, "id")
        .sortWithinPartitions("id")
        .persist()
    )

    def _part_totals(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid, total = TaskContext.get().partitionId(), 0
        for pdf in batches:
            total += int(pdf["n_tokens"].sum())
        yield pd.DataFrame({"pid": [pid], "total": [total]})

    totals = {
        int(r["pid"]): int(r["total"])
        for r in narrow.mapInPandas(_part_totals, "pid int, total long").collect()
    }
    # exclusive prefix over partition ids == key order (range partitioner)
    offsets, acc = {}, 0
    for pid in range(n_parts):
        offsets[pid] = acc
        acc += totals.get(pid, 0)

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        start = offsets[TaskContext.get().partitionId()]
        for pdf in batches:
            cum = pdf["n_tokens"].cumsum() + start
            out = pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_tokens": pdf["n_tokens"],
                    "pack_id": (cum - pdf["n_tokens"]) // budget,
                }
            )
            start = int(cum.iloc[-1]) if len(cum) else start
            yield out

    return narrow.mapInPandas(_assign, "id long, n_tokens long, pack_id long")


def pack_stats(packed: DataFrame) -> DataFrame:
    """Per-pack doc count and token total (packs other than the last hold
    >= budget tokens by construction; boundary docs may spill past it)."""
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )


# ---- SQL mirrors (DuckDB) ---------------------------------------------------


def sql_pack_sequences(budget: int, table: str = "documents", key: str = "doc_id") -> str:
    return f"""
with t as (
  select {key}::bigint as id, len({SQL_TOKENS})::bigint as n_tokens from {table}
)
select id, n_tokens,
       cast((sum(n_tokens) over (order by id
              rows between unbounded preceding and current row) - n_tokens)
            // {budget} as bigint) as pack_id
from t
"""


def sql_pack_stats(budget: int, table: str = "documents", key: str = "doc_id") -> str:
    return f"""
select pack_id, count(*)::bigint as n_docs, sum(n_tokens)::bigint as n_tokens
from ({sql_pack_sequences(budget, table, key)})
group by pack_id
"""
