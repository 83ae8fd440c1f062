"""Suggestion-field index (search_as_you_type analogue): the shingle
analyzer indexed as its own field, queried with prefix expansion and
per-n-gram boosts ^10/^5/^2 — mirrors the reference's SAYT test
(``IndexerServiceIT.java:213-243``: partial input 'auro' matches the
record with 'aurora australis')."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from es_indexer_spark.analysis import analyze
from es_indexer_spark.corpus import assign_doc_ordinals, synth_transcripts, with_doc_ids
from es_indexer_spark.index.build import build_index
from es_indexer_spark.oracle import oracle_from_spark
from es_indexer_spark.query.engine import IndexSearcher


def _corpus(spark):
    base = synth_transcripts(spark, n_convs=40, turns_per_conv=4, seed=9)
    extra = spark.createDataFrame(
        [
            ("convzz000001", 0, "user", "Voyage of the aurora australis vessel", None,
             "2024-01-01 00:00:00"),
            ("convzz000002", 0, "user", "aurora borealis watching trip", None,
             "2024-01-01 00:00:00"),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    return base.unionByName(extra)


@pytest.fixture(scope="module")
def sayt(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("sayt"))
    build_index(spark, _corpus(spark), idx, n_buckets=8, n_segments=2,
                analyzer="suggest")
    return IndexSearcher(spark, idx)


def test_suggest_analyzer_dictionary_has_shingles(sayt):
    d = sayt.term_dictionary()
    assert (d["term"].str.contains(" ")).any()  # multi-word shingles indexed
    assert "aurora australis" in set(d["term"])


def test_partial_input_matches_phrase_docs(sayt):
    # the reference's 'auro' → 'aurora australis' behaviour
    got = sayt.suggest("voyage auro", k=5, fuzzy=False)
    assert len(got) >= 1
    assert got["conv_id"].iloc[0] == "convzz000001"
    # single-token partial matches both aurora docs
    got2 = sayt.suggest("auro", k=5, fuzzy=False)
    assert set(got2["conv_id"]) >= {"convzz000001", "convzz000002"}


def test_ngram_boosts_change_ranking(sayt):
    # boosting 2-grams over unigrams must rank the exact-phrase doc first
    exp = sayt.expand_prefix("aurora")
    assert "aurora australis" in exp
    flat = sayt.search(exp, k=5)
    boosted = sayt.search(exp, k=5, term_boosts={"aurora australis": 100.0})
    assert boosted["conv_id"].iloc[0] == "convzz000001"
    assert set(flat.columns) == set(boosted.columns)


def test_term_boosts_rank_identical_to_oracle(spark, sayt):
    docs = assign_doc_ordinals(with_doc_ids(_corpus(spark)))
    orc = oracle_from_spark(docs, analyzer="suggest")
    tb = {"aurora": 10.0, "aurora australis": 5.0, "vessel": 2.0}
    terms = list(tb)
    want = orc.topk(terms, k=10, term_boosts=tb)
    got = sayt.search(terms, k=10, term_boosts=tb)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"], want["score"], rtol=0, atol=0)
    got_bm = sayt.search(terms, k=10, term_boosts=tb, strategy="exhaustive")
    assert got_bm["score"].tolist() == want["score"].tolist()


def test_suggest_analyzer_chain_goldens():
    # analyzer goldens in the spirit of verifyAbstractPhrases
    toks = analyze("The <b>Aurora</b> Australis voyaged in 2020, et al.", "suggest")
    assert "aurora" in toks and "australis" in toks
    assert "aurora australis" in toks
    assert "the" not in toks and "et" not in toks and "2020" not in toks
    assert "<b>" not in " ".join(toks)
