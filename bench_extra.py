#!/usr/bin/env python
"""Round-6 measurement harness (guide §1): isolates the expensive bench
sections so optimizations target the real constant, not the suite wall.

Separate from the FROZEN bench.py. Sections:

  --append-decompose   churn_appends at bench scale, per-append wall +
                       per-stage decomposition (ES_IDX_APPEND_TIMING=1)
  --query-decompose    big-index distributed query: scoring job vs
                       enrichment job split, cold doc-side pack cost
  --build-decompose    index build per-stage walls from the build's own
                       checkpoints (ordinals / doc_stats / postings /
                       term_stats)
  --ops                minhash / curation with noop-style isolation

Prints one JSON line per section.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--append-decompose", action="store_true")
    ap.add_argument("--query-decompose", action="store_true")
    ap.add_argument("--build-decompose", action="store_true")
    ap.add_argument("--ops", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = args.cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    os.environ.setdefault("ES_IDX_APPEND_TIMING", "1")

    from es_indexer_spark import get_spark
    from es_indexer_spark.corpus import synth_transcripts, _vocabulary
    from es_indexer_spark.index.build import build_index
    from es_indexer_spark.query.engine import IndexSearcher

    spark = get_spark(app_name="bench_extra", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    sc = spark.sparkContext

    # same warm-up as bench.py
    from pyspark.sql import functions as F
    from es_indexer_spark.analysis import doc_length_udf as _dlu
    (
        spark.range(0, cores * 2000, 1, cores)
        .select(_dlu(F.col("id").cast("string")).alias("d"))
        .groupBy((F.col("d") % 8).alias("k")).count().count()
    )

    import shutil

    if args.append_decompose:
        from es_indexer_spark.streaming.incremental import append_batch
        frag_dir = tempfile.mkdtemp(prefix="bx_frag_")
        n_frag_convs = 20000
        base_frac, n_appends = 0.2, 16
        allc = synth_transcripts(spark, n_convs=n_frag_convs,
                                 turns_per_conv=5, seed=7)
        keyn = F.col("conv_id").substr(5, 8).cast("long")
        cut0 = int(n_frag_convs * base_frac)
        sc.setJobDescription("bx: base build")
        build_index(spark, allc.filter(keyn < cut0), frag_dir,
                    n_buckets=64, input_sorted=True)
        step = (n_frag_convs - cut0) // n_appends
        walls, stage_acc = [], {}
        t_all = time.time()
        for i in range(n_appends):
            lo = cut0 + i * step
            hi = n_frag_convs if i == n_appends - 1 else lo + step
            sc.setJobDescription(f"bx: append {i}")
            t0 = time.time()
            out = append_batch(spark, allc.filter((keyn >= lo) & (keyn < hi)),
                               frag_dir)
            walls.append(round(time.time() - t0, 3))
            for k, v in (out.get("timings") or {}).items():
                stage_acc[k] = round(stage_acc.get(k, 0.0) + v, 3)
        total = round(time.time() - t_all, 3)
        shutil.rmtree(frag_dir, ignore_errors=True)
        print(json.dumps({"section": "append_decompose", "total_s": total,
                          "per_append": walls, "stages_total_s": stage_acc}))

    if args.query_decompose:
        v = _vocabulary()
        big_dir = tempfile.mkdtemp(prefix="bx_big_")
        big = synth_transcripts(spark, n_convs=200000, turns_per_conv=10,
                                seed=42)
        sc.setJobDescription("bx: big build")
        build_index(spark, big, big_dir, n_buckets=64, input_sorted=True)
        s = IndexSearcher(spark, big_dir)
        out = {"section": "query_decompose"}
        sc.setJobDescription("bx: cold doc-side pack")
        t0 = time.time()
        df = s.search_df([str(v[0])], k=10)
        out["cold_score_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        df.collect()
        out["cold_enrich_s"] = round(time.time() - t0, 3)
        for qname, terms, mode in (
            ("hot_or", [str(v[0]), "the"], "or"),
            ("mid_and", [str(v[5]), str(v[9]), str(v[17])], "and"),
            ("rare_or", [str(v[3000]), str(v[4000])], "or"),
        ):
            sco, enr = [], []
            for _ in range(7):
                sc.setJobDescription(f"bx: score {qname}")
                t0 = time.time()
                df = s.search_df(terms, k=10, mode=mode)
                t1 = time.time()
                sc.setJobDescription(f"bx: enrich {qname}")
                df.collect()
                t2 = time.time()
                sco.append(t1 - t0)
                enr.append(t2 - t1)
            out[f"{qname}_score_s"] = round(float(np.median(sco)), 4)
            out[f"{qname}_enrich_s"] = round(float(np.median(enr)), 4)
        s.close()
        shutil.rmtree(big_dir, ignore_errors=True)
        print(json.dumps(out))

    if args.build_decompose:
        import glob
        idx_dir = tempfile.mkdtemp(prefix="bx_idx_")
        big = synth_transcripts(spark, n_convs=200000, turns_per_conv=10,
                                seed=42)
        sc.setJobDescription("bx: build decompose")
        t0 = time.time()
        res = build_index(spark, big, idx_dir, n_buckets=64, input_sorted=True)
        wall = round(time.time() - t0, 3)
        ck = os.path.join(res.version_dir, "checkpoints")

        def _ck(name):
            with open(os.path.join(ck, name)) as f:
                return json.load(f)

        ds = _ck("doc_stats.json")
        batches = sorted(os.path.basename(p) for p in
                         glob.glob(os.path.join(ck, "batch_*.json")))
        out = {
            "section": "build_decompose", "wall_s": wall,
            "ordinals_s": ds.get("ordinals_s"),
            "doc_stats_s": ds["wall_s"],
            "postings_s": round(sum(_ck(b)["wall_s"] for b in batches), 3),
            "term_stats_s": _ck("term_stats.json").get("wall_s"),
        }
        shutil.rmtree(idx_dir, ignore_errors=True)
        print(json.dumps(out))

    if args.ops:
        from es_indexer_spark.ops import cleaning, dedup, sampling
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = {"section": "ops", "sf_dir": sf_dir}
        sc.setJobDescription("bx: minhash")
        t0 = time.time()
        dedup.minhash_lsh_pairs(docs, threshold=0.8, num_hashes=64,
                                bands=32).count()
        out["op_minhash_dedup_s"] = round(time.time() - t0, 3)
        sc.setJobDescription("bx: curation")
        t0 = time.time()
        cleaning.curate(docs, sampling.hash_sample(docs, 0.05),
                        quality_min=0.65, sample_rate=0.5).count()
        out["op_curation_s"] = round(time.time() - t0, 3)
        print(json.dumps(out))

    spark.stop()


if __name__ == "__main__":
    main()
