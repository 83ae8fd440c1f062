"""Q5/Q10: query-time synonym expansion against a live-updatable set —
the acronym_search_analyser + synonyms PUT/GET surface
(portal_records_index_schema.json:39-43; AcronymService.java:412-420)."""

from __future__ import annotations

import pytest

from es_indexer_spark.analysis import SynonymSet, build_acronym_rules
from es_indexer_spark.corpus import synth_transcripts
from es_indexer_spark.index.build import build_index
from es_indexer_spark.query.engine import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("syn_idx"))
    build_index(
        spark,
        synth_transcripts(spark, n_convs=50, turns_per_conv=5, seed=3),
        idx, n_buckets=8, n_segments=2,
    )
    return IndexSearcher(spark, idx)


def test_synonym_expansion_widens_results(searcher):
    base = searcher.search(["baco"], k=100)
    searcher.synonyms.replace(["baco => cora"])
    assert searcher.synonyms.version == 1
    exp = searcher.search(["baco"], k=100, expand_synonyms=True)
    both = searcher.search(["baco", "cora"], k=100)
    assert exp["doc_id"].tolist() == both["doc_id"].tolist()
    assert len(exp) >= len(base)


def test_synonym_replace_is_versioned(searcher):
    v = searcher.synonyms.version
    searcher.synonyms.replace(["soop => ship of opportunity"])
    assert searcher.synonyms.version == v + 1
    assert searcher.synonyms.expand(["soop"])[0][0] == "soop"
    assert "ship" in searcher.synonyms.expand(["soop"])[0]


def test_acronym_rule_pipeline():
    rules = build_acronym_rules(
        [
            "SOOP - Ship Of Opportunity",
            "Integrated Marine Observing System - IMOS",
            "CO2 - Carbon Dioxide",  # in the known-bad drop set
            "lowercase - not an acronym",
        ],
        manual_rules=["ams => australian marine sciences"],
    )
    assert "soop => ship of opportunity" in rules
    assert "imos => integrated marine observing system" in rules
    assert "ams => australian marine sciences" in rules
    assert not any(r.startswith("co2 ") for r in rules)
    assert not any("not an acronym =>" in r for r in rules)
    assert rules == sorted(rules)
