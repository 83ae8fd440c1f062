#!/usr/bin/env python
"""Measure the cost of positional postings (`with_positions=True`) vs the
default positions-less index on the bench corpus: build wall, postings
bytes on disk, and encoded-bytes from the manifest. Phrase queries need
positions (the engine raises on a positions-less index); this quantifies
what that capability costs, for BENCH.md.

Usage: python scripts/positions_cost.py [--n-convs 200000] [--cores 32]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from es_indexer_spark import get_spark
    from es_indexer_spark.corpus import synth_transcripts
    from es_indexer_spark.index.build import build_index

    spark = get_spark(app_name="positions_cost",
                      master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores)
    corpus = synth_transcripts(spark, n_convs=args.n_convs,
                               turns_per_conv=10, seed=42)
    out = {"n_turns": args.n_convs * 10, "cores": args.cores}
    for wp in (False, True):
        idx = tempfile.mkdtemp(prefix=f"poscost_{int(wp)}_")
        t0 = time.time()
        res = build_index(spark, corpus, idx, n_buckets=64,
                          with_positions=wp, input_sorted=True)
        tag = "pos" if wp else "nopos"
        out[f"build_s_{tag}"] = round(time.time() - t0, 3)
        out[f"postings_disk_bytes_{tag}"] = du(
            os.path.join(res.version_dir, "postings"))
        out[f"encoded_bytes_{tag}"] = res.metrics["bytes_compressed"]
        shutil.rmtree(idx, ignore_errors=True)
    out["disk_ratio_pos_over_nopos"] = round(
        out["postings_disk_bytes_pos"] / out["postings_disk_bytes_nopos"], 3)
    out["build_ratio_pos_over_nopos"] = round(
        out["build_s_pos"] / out["build_s_nopos"], 3)
    spark.stop()
    out["recorded_at"] = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "POSITIONS_COST.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
