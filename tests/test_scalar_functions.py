"""Scalar function library (SURVEY §2.9) — golden cases mirroring the
reference's unit-tested transforms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.functions import scalar


@pytest.fixture(scope="module")
def sdf(spark):
    rows = [
        ("2020-03-15T10:20:30", "a"), ("2020-03-15", "b"), ("2020-03", "c"),
        ("2020", "d"), ("garbage", "e"), ("2020-02", "f"),
    ]
    return spark.createDataFrame(rows, "d string, id string")


def test_normalize_date_widening(sdf):
    got = {
        r["id"]: (str(r["lo"]), str(r["hi"]))
        for r in sdf.select(
            "id",
            scalar.normalize_date("d", end=False, tz="UTC").alias("lo"),
            scalar.normalize_date("d", end=True, tz="UTC").alias("hi"),
        ).collect()
    }
    assert got["a"] == ("2020-03-15 10:20:30", "2020-03-15 10:20:30")
    assert got["b"] == ("2020-03-15 00:00:00", "2020-03-15 23:59:59")
    assert got["c"] == ("2020-03-01 00:00:00", "2020-03-31 23:59:59")
    assert got["f"][1] == "2020-02-29 23:59:59"  # leap-year month end
    assert got["d"] == ("2020-01-01 00:00:00", "2020-12-31 23:59:59")
    assert got["e"] == ("None", "None")


def test_normalize_date_timezone(spark):
    # Hobart is UTC+11 in January (AEDT): local midnight -> 13:00 prior day UTC
    r = spark.createDataFrame([("2020-01-10",)], "d string").select(
        scalar.normalize_date("d", tz="Australia/Hobart").alias("ts")
    ).collect()[0]
    assert str(r["ts"]) == "2020-01-09 13:00:00"


def test_extract_version_and_max_by(spark):
    df = spark.createDataFrame(
        [
            ("g1", "Cite this for Version 2.1"),
            ("g1", "Cite this for Version 10.0"),
            ("g1", "no version here"),
            ("g2", "only for Version 1.2.3"),
        ],
        "g string, cit string",
    )
    out = {
        r["g"]: (r["latest_citation"], r["max_version"])
        for r in scalar.latest_version_citation(df, "g", "cit").collect()
    }
    assert out["g1"] == ("Cite this for Version 10.0", 10.0)
    assert out["g2"] == ("only for Version 1.2.3", 1.2)


def test_status_and_delivery_mode(spark):
    df = spark.createDataFrame(
        [
            ("complete", "t", "a", "l"),
            ("onGoing", "Near real-time SST", "a", "l"),
            ("on going", "t", "delayed-mode data", "l"),
            ("ongoing", "t", "a", "l"),
        ],
        "status string, title string, abstract string, lineage string",
    )
    got = df.select(
        scalar.normalize_status("status").alias("st"),
        scalar.delivery_mode(
            F.col("status"), F.col("title"), F.col("abstract"), F.col("lineage")
        ).alias("dm"),
    ).collect()
    assert [r["st"] for r in got] == ["completed", "ongoing", "ongoing", "ongoing"]
    assert [r["dm"] for r in got] == ["delayed", "real-time", "delayed", "other"]


def test_keyword_helpers(spark):
    df = spark.createDataFrame(
        [("EARTH SCIENCE > OCEANS | SEA TEMPERATURE", "A, B ,c", "HTTP--DOWNLOAD link")],
        "kw string, groups string, proto string",
    )
    r = df.select(
        scalar.last_keyword_segment("kw").alias("last"),
        scalar.split_group_names("groups").alias("gs"),
        scalar.protocol_relation("proto").alias("rel"),
    ).collect()[0]
    assert r["last"] == "sea temperature"
    assert r["gs"] == ["a", "b", "c"]
    assert r["rel"] == "data"


def test_split_oversize(spark):
    df = spark.createDataFrame(
        [(1, list(range(10))), (2, list(range(3)))], "id int, xs array<int>"
    )
    out = scalar.split_oversize(df, "xs", max_items=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append((r["chunk_idx"], r["chunk"]))
    assert [c for _, c in sorted(by_id[1])] == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
    assert by_id[2] == [(0, [0, 1, 2])]
