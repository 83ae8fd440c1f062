#!/usr/bin/env python
"""Decompose the postings stage (the flagship north-rule path) into its
three components at several parallelism levels, to pin WHERE its scaling
curve bends (round-2 VERDICT item 1: 20.6 s @ local[8] → 23.4 s @
local[32] — the only build stage that got SLOWER with cores).

Method: the same dataflow is truncated at three successively deeper
points, each materialized with Spark's metrics-free ``noop`` sink (or the
real parquet write for the full stage), best-of-R per action:

  A. map-only        = tokenize→encode mapInPandas, Arrow both ways,
                       no shuffle, no disk            (noop sink)
  B. + shuffle+merge = A + repartition(tbucket, seg) + in-partition sort
                       + byte-concat merge            (noop sink)
  C. + parquet write = B + partitionBy(tbucket) parquet to local disk

Components: map = A; shuffle+sort+merge = B - A; parquet write = C - B.
Each level runs in its own subprocess (own JVM), CPU-pinned with taskset
to exactly its core budget — the same protocol as scaling_run.py.

Usage: python scripts/postings_decompose.py [--n-convs 400000]
       [--levels 8,16,32] [--reps 2]
Prints one JSON line per level plus a markdown component table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LEVEL = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, %(repo)r)
from es_indexer_spark import get_spark
from es_indexer_spark.corpus import assign_doc_ordinals, synth_transcripts, with_doc_ids
from es_indexer_spark.index.build import _enc_schema, _tokenize_encode, merge_chunks

cores, n_convs, reps = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(app_name=f"postings_decompose_{cores}",
                  master=f"local[{cores}]", shuffle_partitions=cores)
sc = spark.sparkContext

corpus = synth_transcripts(spark, n_convs=n_convs, turns_per_conv=10, seed=42)
docs = assign_doc_ordinals(with_doc_ids(corpus), assume_sorted=True)
n_docs = docs._total_count
n_segments = max(1, min(65536, -(-n_docs // 1_000_000)))
n_buckets = 64

# stage-1 equivalent: doc_stats parquet (dl + seg), read back — the exact
# input the real postings stage scans
from pyspark.sql import functions as F
from pyspark.sql import types as T
from es_indexer_spark.analysis import doc_lengths
dl_udf = F.pandas_udf(doc_lengths, T.IntegerType())
tmp = tempfile.mkdtemp(prefix=f"decomp_{cores}_")
(docs.withColumn("dl", dl_udf("text"))
     .withColumn("seg", F.least((F.col("doc_ord") * n_segments / n_docs)
                                .cast("long"), F.lit(n_segments - 1)).cast("int"))
     .select("doc_ord", "doc_id", "conv_id", "turn_idx", "role", "tool",
             "ts", "dl", "seg", "text")
     .write.mode("overwrite").parquet(tmp + "/doc_stats"))
parent = getattr(docs, "_persisted_parent", None)
if parent is not None:
    parent.unpersist()
doc_stats = spark.read.parquet(tmp + "/doc_stats")
doc_stats.count()  # warm the page cache so action A's scan isn't cold

with_positions = False
pre = _tokenize_encode(doc_stats, n_docs, n_segments, n_buckets, with_positions)
n_parts = max(sc.defaultParallelism, min(n_segments, 1024))
enc = (pre.repartition(n_parts, "tbucket", "seg")
          .sortWithinPartitions("term", "seg", "min_doc")
          .mapInPandas(lambda it: (merge_chunks(p, with_positions) for p in it),
                       _enc_schema(with_positions)))

out_dir = tmp + "/postings"
def a_map():
    pre.write.mode("overwrite").format("noop").save()
def b_shuffle_merge():
    enc.write.mode("overwrite").format("noop").save()
def c_full():
    shutil.rmtree(out_dir, ignore_errors=True)
    enc.write.mode("overwrite").partitionBy("tbucket").parquet(out_dir)

# warm-up: one full pass absorbs JIT, Python-worker spin-up, Arrow init
# and the doc_stats page-cache fill — otherwise whichever action runs
# first eats all of it and the subtraction goes negative
c_full()

# interleaved reps (A,B,C, A,B,C, ...) so residual drift hits all three
# actions equally; best-of per action
times = {"A": [], "B": [], "C": []}
for _ in range(reps):
    for key, action in (("A", a_map), ("B", b_shuffle_merge), ("C", c_full)):
        t0 = time.perf_counter(); action(); times[key].append(time.perf_counter() - t0)
t_map, t_sm, t_full = min(times["A"]), min(times["B"]), min(times["C"])

print(json.dumps({
    "cores": cores, "n_docs": n_docs, "n_segments": n_segments,
    "map_s": round(t_map, 3),
    "shuffle_merge_s": round(t_sm - t_map, 3),
    "parquet_write_s": round(t_full - t_sm, 3),
    "full_s": round(t_full, 3),
}))
spark.stop()
shutil.rmtree(tmp, ignore_errors=True)
"""


def run_level(cores: int, n_convs: int, reps: int) -> dict:
    cmd = [sys.executable, "-c", _LEVEL % {"repo": REPO},
           str(cores), str(n_convs), str(reps)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, check=True)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=400_000)
    ap.add_argument("--levels", default="8,16,32")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    levels = [int(c) for c in args.levels.split(",")]
    results = {c: run_level(c, args.n_convs, args.reps) for c in levels}
    for c in levels:
        print(json.dumps(results[c]))

    lo, hi = levels[0], levels[-1]
    comps = ["map_s", "shuffle_merge_s", "parquet_write_s", "full_s"]
    print("\n| component | " + " | ".join(f"local[{c}]" for c in levels)
          + f" | {lo}→{hi} speedup |")
    print("|---|" + "---|" * (len(levels) + 1))
    for k in comps:
        sp = results[lo][k] / results[hi][k] if results[hi][k] else float("nan")
        print(f"| {k} | "
              + " | ".join(f"{results[c][k]}s" for c in levels)
              + f" | {sp:.2f}x |")

    # persist for scaling_run.py to embed into BENCH.md on regeneration;
    # windows accumulate — cross-window agreement is the evidence, since
    # any single window carries host-tenancy drift
    import time as _time

    payload = {
        "recorded_at": _time.strftime("%Y-%m-%d %H:%M UTC", _time.gmtime()),
        "reps": args.reps,
        "levels": levels,
        "results": {str(c): results[c] for c in levels},
    }
    path = os.path.join(REPO, "POSTINGS_DECOMP.json")
    doc = {"windows": []}
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        doc["windows"] = old.get("windows", [old] if "results" in old else [])
    doc["windows"].append(payload)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
