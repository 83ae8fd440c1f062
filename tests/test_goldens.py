"""Checked-in golden query set (FIXTURES.md §2): the engine must stay
rank-identical — docIDs and exact float64 scores (hex-compared, zero
tolerance) — to the committed oracle outputs across code changes. The
analogue of the reference's STRICT JSONAssert golden files
(StacCollectionMapperServiceTest.java:107-115)."""

from __future__ import annotations

import json
import os

import pytest

from es_indexer_spark.corpus import synth_transcripts
from es_indexer_spark.index.build import build_index
from es_indexer_spark.query.engine import IndexSearcher

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "queryset.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory, golden):
    c = golden["corpus"]
    idx = str(tmp_path_factory.mktemp("golden_idx"))
    build_index(
        spark,
        synth_transcripts(spark, c["n_convs"], c["turns_per_conv"], seed=c["seed"]),
        idx, n_buckets=16, n_segments=4,
    )
    return IndexSearcher(spark, idx)


def test_goldens_exist(golden):
    assert len(golden["queries"]) >= 10


@pytest.fixture(scope="module")
def multifield(spark, tmp_path_factory, golden):
    """std^10 + sayt^5 multi-field searcher over the same golden corpus —
    the reference's nested bool_prefix query shape
    (IndexerServiceIT.java:219-238)."""
    from es_indexer_spark.query.multifield import MultiFieldSearcher

    c = golden["corpus"]
    df_args = (c["n_convs"], c["turns_per_conv"])
    b1, b2 = golden["multifield"]["field_boosts"]
    d1 = str(tmp_path_factory.mktemp("golden_mf_std"))
    d2 = str(tmp_path_factory.mktemp("golden_mf_sayt"))
    build_index(
        spark, synth_transcripts(spark, *df_args, seed=c["seed"]), d1,
        n_buckets=16, n_segments=4,
    )
    build_index(
        spark, synth_transcripts(spark, *df_args, seed=c["seed"]), d2,
        n_buckets=16, n_segments=4, analyzer="suggest",
    )
    return MultiFieldSearcher(
        [(IndexSearcher(spark, d1), b1), (IndexSearcher(spark, d2), b2)]
    )


@pytest.mark.parametrize("i", range(5))
def test_golden_multifield_bool_prefix(multifield, golden, i):
    q = golden["multifield"]["queries"][i]
    got = multifield.bool_prefix(q["query"], k=q["k"], fuzzy=q["fuzzy"])
    assert got["doc_id"].tolist() == [g["doc_id"] for g in q["golden"]], q["query_id"]
    assert [float(s).hex() for s in got["score"]] == [
        g["score_hex"] for g in q["golden"]
    ], q["query_id"]


@pytest.mark.parametrize("i", range(10))
def test_golden_query(searcher, golden, i):
    q = golden["queries"][i]
    for strategy in ("exhaustive", "blockmax"):
        got = searcher.search(
            q["terms"], k=q["k"], mode=q["mode"], strategy=strategy,
            role_boosts=q.get("role_boosts"), term_boosts=q.get("term_boosts"),
        )
        assert got["doc_id"].tolist() == [g["doc_id"] for g in q["golden"]], (
            q["query_id"], strategy,
        )
        assert [float(s).hex() for s in got["score"]] == [
            g["score_hex"] for g in q["golden"]
        ], (q["query_id"], strategy)
