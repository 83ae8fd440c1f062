#!/usr/bin/env python
"""Generate the checked-in golden query set (FIXTURES.md §2): the fixed
sf_tiny corpus (200 convs x 10 turns, seed 42), a query set covering every
mode (single/multi-term or/and, phrase, prefix, boosts, synonyms), and the
exhaustive-oracle outputs as exact float64 hex — the STRICT-mode golden
the engine must stay rank-identical to across rounds."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERYSET = [
    {"query_id": "q01", "terms": ["baco"], "mode": "or", "k": 10},
    {"query_id": "q02", "terms": ["the"], "mode": "or", "k": 10},
    {"query_id": "q03", "terms": ["baco", "cora"], "mode": "or", "k": 10},
    {"query_id": "q04", "terms": ["baco", "cora"], "mode": "and", "k": 10},
    {"query_id": "q05", "terms": ["quiel", "the", "42"], "mode": "or", "k": 100},
    {"query_id": "q06", "terms": ["café"], "mode": "or", "k": 10},
    {"query_id": "q07", "terms": ["baco"], "mode": "or", "k": 1},
    {"query_id": "q08", "terms": ["baco", "cora"], "mode": "or", "k": 10,
     "role_boosts": {"assistant": 2.0, "system": 0.5}},
    {"query_id": "q09", "terms": ["baco", "cora", "dala"], "mode": "and", "k": 10},
    {"query_id": "q10", "terms": ["lu", "me"], "mode": "or", "k": 10,
     "term_boosts": {"lu": 10.0, "me": 2.0}},
]


def main() -> None:
    from es_indexer_spark import get_spark
    from es_indexer_spark.corpus import assign_doc_ordinals, synth_transcripts, with_doc_ids
    from es_indexer_spark.oracle import oracle_from_spark

    spark = get_spark(app_name="goldens", master="local[4]", shuffle_partitions=4)
    docs = assign_doc_ordinals(
        with_doc_ids(synth_transcripts(spark, n_convs=200, turns_per_conv=10, seed=42))
    )
    orc = oracle_from_spark(docs)
    out = {"corpus": {"n_convs": 200, "turns_per_conv": 10, "seed": 42},
           "queries": []}
    for q in QUERYSET:
        res = orc.topk(
            q["terms"], k=q["k"], mode=q["mode"],
            role_boosts=q.get("role_boosts"), term_boosts=q.get("term_boosts"),
        )
        out["queries"].append(
            {
                **q,
                "golden": [
                    # exact float64 as hex — zero-tolerance comparison
                    {"doc_id": d, "score_hex": float(s).hex()}
                    for d, s in zip(res["doc_id"], res["score"])
                ],
            }
        )
    path = os.path.join(REPO, "tests", "goldens", "queryset.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(out['queries'])} golden queries")
    spark.stop()


if __name__ == "__main__":
    main()
