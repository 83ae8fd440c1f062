#!/usr/bin/env python
"""Capture .explain("formatted") plans for the round-6 optimization
deliverable (plans/r06/<query>_{before,after}.txt).

Run twice: once from a checkout of the round-start commit with
--tag before (writes *_before.txt into the CURRENT repo's plans/r06 via
--out), once from the optimized tree with --tag after. The index fixture
is built fresh each run with the code under test, so each plan reflects
that code's real layout and query pipeline.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, choices=["before", "after"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--repo", default=None, help="repo root to import from")
    args = ap.parse_args()
    if args.repo:
        sys.path.insert(0, args.repo)

    from es_indexer_spark import get_spark
    from es_indexer_spark.corpus import synth_transcripts
    from es_indexer_spark.index.build import build_index
    from es_indexer_spark.query.engine import IndexSearcher
    from es_indexer_spark.streaming.incremental import append_batch
    from pyspark.sql import functions as F

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark(app_name=f"plans_{args.tag}", master="local[8]",
                      shuffle_partitions=8)

    def dump(name: str, df) -> None:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(args.out, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(buf.getvalue())

    idx = tempfile.mkdtemp(prefix=f"plans_{args.tag}_")
    allc = synth_transcripts(spark, n_convs=2000, turns_per_conv=5, seed=7)
    keyn = F.col("conv_id").substr(5, 8).cast("long")
    build_index(spark, allc.filter(keyn < 1500), idx, n_buckets=16,
                input_sorted=True)
    append_batch(spark, allc.filter(keyn >= 1500), idx)
    s = IndexSearcher(spark, idx)

    # 1. distributed top-k returned plan (stored-fields fetch phase)
    dump("search_df_topk", s.search_df(["baco", "cora"], k=10))

    # 2. term dictionary publish plan (the write side of term_stats)
    from es_indexer_spark.index.build import term_bucket_col, term_len_col
    postings = spark.read.parquet(os.path.join(s.vdir, "postings"))
    agg = (
        postings.groupBy("term")
        .agg(F.sum("df_chunk").alias("df"), F.sum("sum_tf").alias("total_tf"),
             F.count("*").alias("n_chunks"),
             F.max(F.array_max("block_max_tf")).alias("max_tf"))
        .withColumn("tbucket", term_bucket_col(16))
        .withColumn("tlen", term_len_col())
    )
    try:  # after: hash repartition; before: repartitionByRange
        dict_plan = agg.repartition(4, "tlen").sortWithinPartitions("tlen", "term")
        if args.tag == "before":
            dict_plan = agg.repartitionByRange(4, "tlen", "term").sortWithinPartitions("tlen", "term")
    except Exception:
        dict_plan = agg
    dump("term_stats_publish", dict_plan)

    # 3. append ordinal shuffle (the batch pre-pass)
    batch = allc.filter(keyn >= 1500).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts")
    from es_indexer_spark.corpus import with_doc_ids
    if args.tag == "after":
        pre = (with_doc_ids(batch.persist())
               .repartitionByRange(1, "conv_id", "turn_idx")
               .sortWithinPartitions("conv_id", "turn_idx"))
    else:
        pre = (with_doc_ids(batch)
               .repartitionByRange(2, "conv_id", "turn_idx")
               .sortWithinPartitions("conv_id", "turn_idx"))
    dump("append_ordinal_shuffle", pre)

    # 4. fuzzy dictionary expansion scan (tlen pruning — unchanged claim)
    from es_indexer_spark.index.build import term_len_band
    lo, hi = term_len_band(4, 1)
    td = s._term_stats_sdf()
    if "tlen" in td.columns:
        td = td.filter((F.col("tlen") >= lo) & (F.col("tlen") <= hi))
    dump("fuzzy_dictionary_scan",
         td.filter((F.length("term") >= 3) & (F.length("term") <= 5)
                   & (F.levenshtein(F.lit("baco"), F.col("term")) <= 1)))

    s.close()
    spark.stop()


if __name__ == "__main__":
    main()
