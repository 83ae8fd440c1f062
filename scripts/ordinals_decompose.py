#!/usr/bin/env python
"""Decompose the ordinal-assignment stage (round-3 VERDICT item 4: the
largest sub-ideal program-owned stage, 2.04x of 4x ideal at 8→32) into
its components at several parallelism levels, to pin WHERE its scaling
curve bends — the same truncation-ladder protocol postings_decompose.py
used to exonerate the postings stage.

The stage (``corpus.assign_doc_ordinals``, assume_sorted=False) is:
range-partition shuffle → within-partition sort → persist → per-partition
counting pass → per-partition enumeration. The ladder truncates it at
four successively deeper points over the SAME parquet-parked input
(scan warmed into page cache first, so the corpus generator's cost never
pollutes the stage):

  A. scan+doc_id    = parquet scan + concat_ws doc_id      (noop sink)
  B. + range+sort   = A + repartitionByRange(conv_id, turn_idx)
                      + sortWithinPartitions — includes the range
                      partitioner's sampling job over the scan (noop)
  C. + persist+count= the real assign_doc_ordinals actions: persist
                      (MEMORY_AND_DISK materialization of the shuffled
                      sorted rows) + groupBy(partition).count collect
  D. + enumerate    = C + the ordinal projection consumed once from
                      the persisted parent (noop). NOTE: windows up to
                      2026-08-17 measured the former mapInPandas
                      enumeration; after the round-4 fix this is a pure
                      JVM column expression (monotonically_increasing_id
                      + broadcast offsets), so post-fix windows measure
                      that projection and D−C reads ≈0

Components: scan = A; range_shuffle_sort = B−A; persist+count = C−B;
enumerate = D−C. Each level runs in its own subprocess (own JVM),
CPU-pinned with taskset to exactly its core budget.

Usage: python scripts/ordinals_decompose.py [--n-convs 200000]
       [--levels 8,32] [--reps 2]
Prints one JSON line per level plus a markdown component table, and
appends a window to ORDINALS_DECOMP.json.
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

cores, n_convs, reps = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(app_name=f"ordinals_decompose_{cores}",
                  master=f"local[{cores}]", shuffle_partitions=cores)
sc = spark.sparkContext

# park the corpus in parquet so the stage input is a real table scan (the
# production shape: ordinals are assigned over an Iceberg/parquet table,
# not a generator) and generation cost can't bleed into any component
tmp = tempfile.mkdtemp(prefix=f"ord_decomp_{cores}_")
synth_transcripts(spark, n_convs=n_convs, turns_per_conv=10, seed=42) \
    .write.mode("overwrite").parquet(tmp + "/corpus")
corpus = spark.read.parquet(tmp + "/corpus")
corpus.count()  # warm page cache

n = sc.defaultParallelism
KEYS = ("conv_id", "turn_idx")

def a_scan():
    with_doc_ids(corpus).write.mode("overwrite").format("noop").save()

def b_range_sort():
    (with_doc_ids(corpus)
     .repartitionByRange(n, *KEYS)
     .sortWithinPartitions(*KEYS)
     .write.mode("overwrite").format("noop").save())

def c_assign():
    out = assign_doc_ordinals(with_doc_ids(corpus), num_partitions=n)
    out._persisted_parent.unpersist()
    return out

def d_enumerate():
    out = assign_doc_ordinals(with_doc_ids(corpus), num_partitions=n)
    out.write.mode("overwrite").format("noop").save()
    out._persisted_parent.unpersist()

# warm-up absorbs JIT, Python-worker spin-up and Arrow init
d_enumerate()

times = {"A": [], "B": [], "C": [], "D": []}
for _ in range(reps):
    for key, action in (("A", a_scan), ("B", b_range_sort),
                        ("C", c_assign), ("D", d_enumerate)):
        t0 = time.perf_counter(); action(); times[key].append(time.perf_counter() - t0)
tA, tB, tC, tD = (min(times[k]) for k in "ABCD")

print(json.dumps({
    "cores": cores, "n_turns": n_convs * 10,
    "scan_s": round(tA, 3),
    "range_shuffle_sort_s": round(tB - tA, 3),
    "persist_count_s": round(tC - tB, 3),
    "enumerate_s": round(tD - tC, 3),
    "full_s": round(tD, 3),
    "assign_call_s": round(tC, 3),
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
    ap.add_argument("--n-convs", type=int, default=200_000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    levels = [int(c) for c in args.levels.split(",")]
    results = {c: run_level(c, args.n_convs, args.reps) for c in levels}
    for c in levels:
        print(json.dumps(results[c]))

    lo, hi = levels[0], levels[-1]
    comps = ["scan_s", "range_shuffle_sort_s", "persist_count_s",
             "enumerate_s", "full_s"]
    print("\n| component | " + " | ".join(f"local[{c}]" for c in levels)
          + f" | {lo}→{hi} speedup |")
    print("|---|" + "---|" * (len(levels) + 1))
    for k in comps:
        sp = results[lo][k] / results[hi][k] if results[hi][k] else float("nan")
        print(f"| {k} | "
              + " | ".join(f"{results[c][k]}s" for c in levels)
              + f" | {sp:.2f}x |")

    import time as _time

    payload = {
        "recorded_at": _time.strftime("%Y-%m-%d %H:%M UTC", _time.gmtime()),
        "reps": args.reps,
        "levels": levels,
        "results": {str(c): results[c] for c in levels},
    }
    path = os.path.join(REPO, "ORDINALS_DECOMP.json")
    doc = {"windows": []}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc["windows"].append(payload)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
