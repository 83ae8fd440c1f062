"""Adversarial exactness tests: massive score ties (the strict-< early
exit), empty/single-doc corpora, randomized corpora x query sets — the
WAND==exhaustive==oracle invariant under stress."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from es_indexer_spark.corpus import assign_doc_ordinals, synth_transcripts, with_doc_ids
from es_indexer_spark.index.build import build_index
from es_indexer_spark.oracle import oracle_from_spark
from es_indexer_spark.query.engine import IndexSearcher


def _tx(spark, rows):
    return spark.createDataFrame(
        [(c, t, "user", txt, None, "2024-01-01 00:00:00") for c, t, txt in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")


def _check_all_paths(spark, idx_dir, oracle, terms, k, mode="or"):
    s = IndexSearcher(spark, idx_dir)
    want = oracle.topk(terms, k=k, mode=mode)
    for strat in ("exhaustive", "blockmax"):
        got = s.search(terms, k=k, mode=mode, strategy=strat)
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), (terms, strat)
        assert got["score"].tolist() == want["score"].tolist(), (terms, strat)


def test_all_identical_docs_tiebreak(spark, tmp_path):
    """Every doc ties exactly — ranking must be pure doc_ord order and the
    blockmax early exit must not drop any tied candidate."""
    rows = [(f"c{i:04d}", 0, "alpha beta gamma") for i in range(60)]
    idx = str(tmp_path / "ties")
    build_index(spark, _tx(spark, rows), idx, n_buckets=4, n_segments=3)
    orc = oracle_from_spark(assign_doc_ordinals(with_doc_ids(_tx(spark, rows))))
    _check_all_paths(spark, idx, orc, ["alpha"], k=10)
    _check_all_paths(spark, idx, orc, ["alpha", "beta"], k=25, mode="and")


def test_empty_and_whitespace_texts(spark, tmp_path):
    rows = [("c0", 0, ""), ("c1", 0, "   "), ("c2", 0, "only doc with words"),
            ("c3", 0, "words again")]
    idx = str(tmp_path / "empty")
    build_index(spark, _tx(spark, rows), idx, n_buckets=4)
    orc = oracle_from_spark(assign_doc_ordinals(with_doc_ids(_tx(spark, rows))))
    assert orc.n_docs == 4  # empty docs still counted in N/avgdl
    _check_all_paths(spark, idx, orc, ["words"], k=4)
    s = IndexSearcher(spark, idx)
    assert s.n_docs == 4 and s.count(["nothinghere"]) == 0


def test_single_doc_corpus(spark, tmp_path):
    rows = [("only", 0, "лорем ipsum 'quoted' text_underscore 42")]
    idx = str(tmp_path / "single")
    build_index(spark, _tx(spark, rows), idx, n_buckets=2)
    s = IndexSearcher(spark, idx)
    # underscore splits tokens (Lucene standard tokenizer behaviour)
    assert s.count(["text"]) == 1 and s.count(["underscore"]) == 1
    assert s.count(["лорем"]) == 1  # unicode letters survive
    got = s.search(["ipsum"], k=5)
    assert got["doc_id"].tolist() == ["only:0"]


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_randomized_rank_identity(spark, tmp_path, seed):
    df = synth_transcripts(spark, n_convs=35, turns_per_conv=6, seed=seed)
    idx = str(tmp_path / f"r{seed}")
    build_index(spark, df, idx, n_buckets=8, n_segments=4)
    orc = oracle_from_spark(assign_doc_ordinals(with_doc_ids(
        synth_transcripts(spark, 35, 6, seed=seed))))
    rng = np.random.default_rng(seed)
    vocab = sorted(orc.df)
    for _ in range(6):
        n_terms = int(rng.integers(1, 5))
        terms = list(rng.choice(vocab, size=n_terms, replace=False))
        if rng.random() < 0.3:
            terms.append("zz_absent_term")
        mode = "and" if rng.random() < 0.4 else "or"
        k = int(rng.integers(1, 30))
        _check_all_paths(spark, idx, orc, terms, k=k, mode=mode)


def test_phrase_on_positionless_index_raises(spark, tmp_path):
    """Multi-term phrase queries on an index built with the default
    with_positions=False must fail LOUDLY up front (not silently return 0
    hits), on both execution paths; single-term 'phrases' need no
    positions and still work."""
    idx = str(tmp_path / "idx")
    df = synth_transcripts(spark, n_convs=10, turns_per_conv=3, seed=3)
    build_index(spark, df, idx, n_buckets=4)  # with_positions defaults False
    s = IndexSearcher(spark, idx)
    with pytest.raises(ValueError, match="with_positions"):
        s.phrase_search("the baco")
    with pytest.raises(ValueError, match="with_positions"):
        s.phrase_search_df("the baco", k=5)
    assert isinstance(s.phrase_search("the"), object)  # single term: fine
