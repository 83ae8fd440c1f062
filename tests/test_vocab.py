"""J1/J3 vocabulary enrichment joins vs the reference semantics
(VocabServiceImpl.java:109-168 theme walk, :197-292 org DFS with role
priority), over a canned 3-level tree like the ardcvocabs databag."""

from __future__ import annotations

import pytest

from es_indexer_spark.ops import vocab

TREE = [
    {
        "label": "Chemical", "id": "1", "url": "u/1", "narrower": [
            {
                "label": "Water Quality", "id": "1.1", "url": "u/1.1",
                "narrower": [
                    {"label": "Turbidity", "id": "1.1.1", "url": "u/1.1.1"},
                ],
            },
        ],
    },
    {
        "label": "Orgs", "id": "9", "url": "u/9", "narrower": [
            {
                "label": "CSIRO", "id": "9.1", "url": "u/9.1",
                "alt_labels": ["Commonwealth Scientific and Industrial Research Organisation"],
            },
            {
                "label": "Old Name Org", "id": "9.2", "url": "u/9.2",
                "replaced_by": "9.1",
                "alt_labels": ["legacy org"],
            },
            {
                "label": "IMOS", "id": "9.3", "url": "u/9.3",
                "hidden_labels": ["integrated marine observing system"],
            },
        ],
    },
]


@pytest.fixture(scope="module")
def vdf(spark):
    return vocab.flatten_vocab_tree(spark, TREE)


def test_flatten_levels_and_ancestry(vdf):
    rows = {r["label"]: r for r in vdf.collect()}
    assert rows["Turbidity"]["level"] == 3
    assert rows["Turbidity"]["second_level_label"] == "Water Quality"
    assert rows["Water Quality"]["second_level_label"] == "Water Quality"
    assert rows["Chemical"]["level"] == 1


def test_theme_match_emits_second_level(spark, vdf):
    records = spark.createDataFrame(
        [
            ("r1", [{"id": "1.1.1", "url": "U/1.1.1"}]),   # 3rd level, case-insensitive
            ("r2", [{"id": "1.1", "url": "u/1.1"}]),       # 2nd level direct
            ("r3", [{"id": "1", "url": "u/1"}]),           # 1st level: NOT matched
            ("r4", [{"id": "nope", "url": "u/nope"}]),
        ],
        "record_id string, concepts array<struct<id:string,url:string>>",
    )
    got = {
        (r["record_id"], r["theme_label"])
        for r in vocab.match_themes(records, vdf).collect()
    }
    assert got == {("r1", "Water Quality"), ("r2", "Water Quality")}


def test_org_match_priority_and_replaced_by(spark, vdf):
    contacts = spark.createDataFrame(
        [
            # r1: pointOfContact matches CSIRO alt label, citation matches IMOS
            # hidden label → citation wins (role priority)
            ("r1", "pointOfContact",
             "Commonwealth Scientific and Industrial Research Organisation"),
            ("r1", "citation", "Integrated Marine Observing System"),
            # r2: only a replaced_by node variant → no match at all
            ("r2", "citation", "legacy org"),
            # r3: displayLabel match, any role
            ("r3", "distributor", "csiro"),
        ],
        "record_id string, role string, name string",
    )
    got = {
        r["record_id"]: (r["org_label"], r["role"])
        for r in vocab.match_organisations(contacts, vdf).collect()
    }
    assert got["r1"] == ("IMOS", "citation")
    assert "r2" not in got
    assert got["r3"] == ("CSIRO", "distributor")
