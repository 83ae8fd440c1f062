#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Workload (at $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1, on
local[$SPARK_GRAFT_CPUS]):

1. full inverted-index build over a transcript corpus (the documents
   table adapted to the transcript shape + a deterministic synthetic
   multi-turn corpus sized to the sf) → turns indexed/sec;
2. BM25 query suite over the built index: hot/rare/multi-term AND/OR,
   suggest (prefix+fuzzy), phrase-free driver path (block-max pruned) —
   20 reps each → p50/p95 latency;
3. one distributed (segment-parallel cogroup) search;
4. training-pipeline ops at sf: MinHash-LSH dedup pairs, brute-force
   cosine top-k.

Usage:
  python bench.py                 # standard bench, one JSON line
  python bench.py --cores N       # override SPARK_GRAFT_CPUS
  python bench.py --build-only    # index-build throughput only (used by
                                  # scripts/scaling_run.py for the N-vs-4N
                                  # scaling-efficiency evidence)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


QUERY_SET = [
    ("hot_or", dict(query=["the", "and"], mode="or")),
    ("mixed_or", dict(query=["spark", "merge", "join"], mode="or")),
    ("mixed_and", dict(query=["spark", "window", "batch"], mode="and")),
    ("rare_or", dict(query=["dup", "stream"], mode="or")),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--sf-dir", default=None)
    args = ap.parse_args()

    sf_dir = args.sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = args.cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)

    timing_dir = None
    if args.build_only:
        # per-phase kernel CPU accounting (workers inherit the env through
        # the JVM, so this must be set before the session starts)
        timing_dir = tempfile.mkdtemp(prefix="bench_phase_")
        os.environ["ES_IDX_PHASE_TIMING_DIR"] = timing_dir

    from es_indexer_spark import get_spark
    from es_indexer_spark.corpus import documents_as_transcripts, synth_transcripts
    from es_indexer_spark.index.build import build_index
    from es_indexer_spark.query.engine import IndexSearcher

    spark = get_spark(app_name="bench", master=f"local[{cores}]", shuffle_partitions=cores)

    # warm-up OUTSIDE the timed region: spawn every Python worker (Arrow +
    # numpy import, ~1-2s each), JIT the scan/shuffle/pandas-UDF paths.
    # A long-running cluster pays these once per executor lifetime, not
    # per job — the bench measures steady-state throughput.
    from pyspark.sql import functions as _F

    from es_indexer_spark.analysis import doc_length_udf as _dlu

    (
        spark.range(0, cores * 2000, 1, cores)
        .select(_dlu(_F.col("id").cast("string")).alias("d"))
        .groupBy((_F.col("d") % 8).alias("k"))
        .count()
        .count()
    )

    t_all = time.time()
    queries: dict[str, float] = {}

    # ---- 1. index build ---------------------------------------------------
    scaling_convs = os.environ.get("SPARK_GRAFT_SCALING_CONVS")
    input_sorted = False
    if scaling_convs:
        # scaling_run.py: pure synthetic corpus, parallelism-invariant and
        # generated in (conv_id, turn_idx) order → sorted-input fast path
        # (the standard layout of the production transcript table)
        input_sorted = True
        corpus = synth_transcripts(
            spark, n_convs=int(scaling_convs), turns_per_conv=10, seed=42
        )
    else:
        n_convs = max(200, int(20000 * sf * 10)) if sf > 0 else 2000
        docs_tx = documents_as_transcripts(spark, sf_dir)
        synth_tx = synth_transcripts(spark, n_convs=n_convs, turns_per_conv=10, seed=42)
        corpus = docs_tx.unionByName(synth_tx)

    idx_dir = tempfile.mkdtemp(prefix="bench_idx_")
    t0 = time.time()
    res = build_index(spark, corpus, idx_dir, n_buckets=64, input_sorted=input_sorted)
    build_s = time.time() - t0
    queries["index_build"] = round(build_s, 3)
    turns_per_sec = res.n_docs / build_s

    out = {
        "n_turns": res.n_docs,
        "turns_per_sec": round(turns_per_sec, 1),
        "index_tokens": res.total_tokens,
        "compression_ratio": res.metrics.get("compression_ratio"),
        "cores": cores,
    }

    if args.build_only:
        # per-STAGE wall time from the build's own checkpoints...
        ck = os.path.join(res.version_dir, "checkpoints")

        def _ck(name):
            with open(os.path.join(ck, name)) as f:
                return json.load(f)

        batches = sorted(n for n in os.listdir(ck) if n.startswith("batch_"))
        ds = _ck("doc_stats.json")
        out["stages"] = {
            "ordinals_s": ds.get("ordinals_s"),
            "doc_stats_s": ds["wall_s"],
            "postings_s": round(sum(_ck(b)["wall_s"] for b in batches), 3),
            "term_stats_s": _ck("term_stats.json").get("wall_s"),
        }
        # ...and per-PHASE kernel wall + true-CPU seconds from the workers
        wall: dict[str, float] = {}
        cpu: dict[str, float] = {}
        for fn in os.listdir(timing_dir):
            with open(os.path.join(timing_dir, fn)) as f:
                for line in f:
                    phase, w, c, _rows = line.strip().split(",")
                    wall[phase] = wall.get(phase, 0.0) + float(w)
                    cpu[phase] = cpu.get(phase, 0.0) + float(c)
        out["phase_wall_s"] = {k: round(v, 2) for k, v in sorted(wall.items())}
        out["phase_cpu_s"] = {k: round(v, 2) for k, v in sorted(cpu.items())}

    if not args.build_only:
        # ---- 2. query latency suite ---------------------------------------
        searcher = IndexSearcher(spark, idx_dir)
        searcher.search(["the"], k=10)  # warm (norms load + arrow datasets)
        searcher.term_dictionary()  # warm the dictionary (suggest/fuzzy path)
        lats_all = []
        for name, kw in QUERY_SET:
            lats = []
            for _ in range(20):
                t0 = time.time()
                searcher.search(k=10, strategy="blockmax", **kw)
                lats.append(time.time() - t0)
            queries[f"q_{name}"] = round(float(np.median(lats)), 4)
            lats_all.extend(lats)
        t0 = time.time()
        searcher.suggest("merge jo", k=10)
        queries["q_suggest"] = round(time.time() - t0, 4)
        out["query_p50_ms"] = round(float(np.percentile(lats_all, 50)) * 1000, 2)
        out["query_p95_ms"] = round(float(np.percentile(lats_all, 95)) * 1000, 2)

        # ---- 3. distributed search ----------------------------------------
        # cold = first query on a fresh searcher (pays the one-time
        # doc-side cache build); warm = steady-state with the persisted
        # seg-partitioned norms (the deployed serving shape)
        t0 = time.time()
        searcher.search_df(["spark", "merge", "join"], k=10).collect()
        queries["q_distributed_topk_cold"] = round(time.time() - t0, 3)
        t0 = time.time()
        searcher.search_df(["spark", "merge", "join"], k=10).collect()
        queries["q_distributed_topk"] = round(time.time() - t0, 3)

        # ---- 3b. suggestion-field index + SAYT -----------------------------
        docs_tx_small = docs_tx.limit(20000)
        sugg_dir = tempfile.mkdtemp(prefix="bench_sugg_")
        t0 = time.time()
        build_index(spark, docs_tx_small, sugg_dir, n_buckets=32, analyzer="suggest")
        queries["suggest_index_build"] = round(time.time() - t0, 3)
        sayt = IndexSearcher(spark, sugg_dir)
        sayt.term_dictionary()
        sayt.search(["the"], k=1)
        lats = []
        for _ in range(10):
            t0 = time.time()
            sayt.suggest("merge jo", k=10, fuzzy=False)
            lats.append(time.time() - t0)
        queries["q_sayt_suggest"] = round(float(np.median(lats)), 4)

        # ---- 4. pipeline ops ----------------------------------------------
        from es_indexer_spark.ops import cleaning, dedup, sampling, similarity

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = time.time()
        dedup.minhash_lsh_pairs(docs, threshold=0.8, num_hashes=64, bands=32).count()
        queries["op_minhash_dedup"] = round(time.time() - t0, 3)

        t0 = time.time()
        cleaning.curate(
            docs, sampling.hash_sample(docs, 0.05), quality_min=0.65, sample_rate=0.5
        ).count()
        queries["op_curation"] = round(time.time() - t0, 3)

        t0 = time.time()
        dedup.duplicated_ngrams(docs, n=8).count()
        queries["op_dup_ngrams"] = round(time.time() - t0, 3)

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qv = emb.limit(1).toPandas()["embedding"].iloc[0]
        t0 = time.time()
        similarity.cosine_topk_arrow(emb, qv, k=10).collect()
        queries["op_cosine_topk"] = round(time.time() - t0, 3)

        # ---- 5. sf1-scale distributed query suite -------------------------
        # At sf0.1 (~200k turns) the distributed top-k is dominated by job
        # scheduling (~1.2 s for k rows), so the bench cannot see query-path
        # regressions. This section builds a ~2M-turn index (deterministic
        # synthetic corpus, sorted-input fast path — the production table
        # layout) and measures the segment-parallel cogroup path with
        # p50/p95 over several query shapes at a scale where per-segment
        # work dominates scheduling.
        from es_indexer_spark.corpus import _vocabulary

        big_convs = int(os.environ.get("SPARK_GRAFT_BIG_CONVS", "200000"))
        big_dir = tempfile.mkdtemp(prefix="bench_big_")
        big = synth_transcripts(spark, n_convs=big_convs, turns_per_conv=10, seed=42)
        t0 = time.time()
        res_big = build_index(spark, big, big_dir, n_buckets=64, input_sorted=True)
        queries["big_index_build"] = round(time.time() - t0, 3)
        out["big_n_turns"] = res_big.n_docs
        out["big_turns_per_sec"] = round(res_big.n_docs / queries["big_index_build"], 1)

        v = _vocabulary()
        big_queries = [
            ("hot_or", [str(v[0]), "the"], "or"),
            ("mid_and", [str(v[5]), str(v[9]), str(v[17])], "and"),
            ("rare_or", [str(v[3000]), str(v[4000])], "or"),
        ]
        sbig = IndexSearcher(spark, big_dir)
        t0 = time.time()
        sbig.search_df([str(v[0])], k=10).collect()  # cold: doc-side cache
        queries["q_big_distributed_cold"] = round(time.time() - t0, 3)
        big_lats = []
        for qname, terms, mode in big_queries:
            lats = []
            for _ in range(7):
                t0 = time.time()
                sbig.search_df(terms, k=10, mode=mode).collect()
                lats.append(time.time() - t0)
            queries[f"q_big_{qname}"] = round(float(np.median(lats)), 3)
            big_lats.extend(lats)
        out["big_query_p50_ms"] = round(float(np.percentile(big_lats, 50)) * 1000, 1)
        out["big_query_p95_ms"] = round(float(np.percentile(big_lats, 95)) * 1000, 1)
        sbig.close()
        import shutil

        shutil.rmtree(big_dir, ignore_errors=True)  # hundreds of MB/run

        # ---- 6. huge suite: 10M turns ------------------------------------
        # One order of magnitude past section 5: shows distributed-query
        # warm latency growing sublinearly in corpus size (the per-segment
        # kernels dominate, scheduling amortizes) and records the packed
        # doc-side norms' executor-memory footprint (the only per-corpus
        # resident state on the serving path, ~8 B/doc design target).
        # SPARK_GRAFT_HUGE_CONVS=0 disables.
        huge_convs = int(os.environ.get("SPARK_GRAFT_HUGE_CONVS", "1000000"))
        if huge_convs > 0:
            searcher.close()  # release earlier doc-side caches so the
            sayt.close()      # storage-info readout below is huge-only
            huge_dir = tempfile.mkdtemp(prefix="bench_huge_")
            huge = synth_transcripts(
                spark, n_convs=huge_convs, turns_per_conv=10, seed=42
            )
            t0 = time.time()
            res_huge = build_index(spark, huge, huge_dir, n_buckets=64,
                                   input_sorted=True)
            queries["huge_index_build"] = round(time.time() - t0, 3)
            out["huge_n_turns"] = res_huge.n_docs
            out["huge_turns_per_sec"] = round(
                res_huge.n_docs / queries["huge_index_build"], 1
            )
            shuge = IndexSearcher(spark, huge_dir)
            t0 = time.time()
            shuge.search_df([str(v[0])], k=10).collect()  # cold: doc-side cache
            queries["q_huge_distributed_cold"] = round(time.time() - t0, 3)
            huge_lats = []
            for qname, terms, mode in big_queries:
                lats = []
                for _ in range(5):
                    t0 = time.time()
                    shuge.search_df(terms, k=10, mode=mode).collect()
                    lats.append(time.time() - t0)
                queries[f"q_huge_{qname}"] = round(float(np.median(lats)), 3)
                huge_lats.extend(lats)
            out["huge_query_p50_ms"] = round(float(np.percentile(huge_lats, 50)) * 1000, 1)
            out["huge_query_p95_ms"] = round(float(np.percentile(huge_lats, 95)) * 1000, 1)
            # persisted packed-norms footprint straight from the block
            # manager (covers every executor in local mode)
            mem = 0
            for info in spark.sparkContext._jsc.sc().getRDDStorageInfo():
                mem += int(info.memSize()) + int(info.diskSize())
            out["huge_norms_mem_mb"] = round(mem / 1e6, 1)
            out["huge_norms_bytes_per_doc"] = round(mem / max(1, res_huge.n_docs), 2)
            shuge.close()
            shutil.rmtree(huge_dir, ignore_errors=True)

        # ---- 7. segment churn + tiered merge ------------------------------
        # The 10^12-turn serving story: a streaming pipeline appends one
        # segment per micro-batch, so segment count — and with it posting
        # chunks per term, packed-norms rows, and cogroup tasks — grows
        # without bound until merged. This measures warm distributed top-k
        # over a micro-batch-fragmented index, then after
        # force_merge(expunge): latency must recover toward the monolithic
        # shape and tombstones must leave the index.
        from es_indexer_spark.index.merge import batch_infos, force_merge
        from es_indexer_spark.streaming.incremental import (
            append_batch, delete_where,
        )
        from pyspark.sql import functions as Fq

        frag_dir = tempfile.mkdtemp(prefix="bench_frag_")
        n_frag_convs = int(os.environ.get("SPARK_GRAFT_FRAG_CONVS", "20000"))
        base_frac, n_appends = 0.2, 16
        allc = synth_transcripts(spark, n_convs=n_frag_convs,
                                 turns_per_conv=5, seed=7)
        keyn = Fq.col("conv_id").substr(5, 8).cast("long")
        cut0 = int(n_frag_convs * base_frac)
        build_index(spark, allc.filter(keyn < cut0), frag_dir,
                    n_buckets=64, input_sorted=True)
        step = (n_frag_convs - cut0) // n_appends
        t0 = time.time()
        for i in range(n_appends):
            lo = cut0 + i * step
            hi = n_frag_convs if i == n_appends - 1 else lo + step
            append_batch(spark, allc.filter((keyn >= lo) & (keyn < hi)), frag_dir)
        queries["churn_appends"] = round(time.time() - t0, 3)
        delete_where(spark, frag_dir, keyn % 7 == 0)

        def _warm_p50(idx_dir):
            s = IndexSearcher(spark, idx_dir)
            s.search_df(["the"], k=10).collect()  # cold doc-side build
            lats = []
            for terms, mode in ((["the"], "or"), ([str(v[5]), str(v[9])], "and")):
                for _ in range(5):
                    t0 = time.time()
                    s.search_df(terms, k=10, mode=mode).collect()
                    lats.append(time.time() - t0)
            s.close()
            return float(np.median(lats))

        out["frag_segments"] = len(batch_infos(
            IndexSearcher(spark, frag_dir).vdir))
        queries["q_fragmented_topk"] = round(_warm_p50(frag_dir), 4)
        t0 = time.time()
        mres = force_merge(spark, frag_dir, max_segments=1, expunge=True)
        queries["segment_merge"] = round(time.time() - t0, 3)
        out["merge_docs_expunged"] = mres["docs_expunged"]
        queries["q_merged_topk"] = round(_warm_p50(frag_dir), 4)
        shutil.rmtree(frag_dir, ignore_errors=True)

    out.update(
        {
            "metric": "index_build_plus_query_suite_wall",
            "value": round(time.time() - t_all, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
        }
    )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
