"""A6 bbox expand-union semantics (StacUtils.java:47-126): hand-crafted
envelope groups hitting every branch, checked against expected outputs and
against the DuckDB SQL mirror."""

from __future__ import annotations

import duckdb
import pandas as pd

from es_indexer_spark.functions import geo

ROWS = [
    # g1: east box + box entirely west of the antimeridian region →
    # west box shifts +360, union crosses the antimeridian: maxX ends > 180
    ("g1", 170.0, -10.0, 175.0, 10.0),
    ("g1", -175.0, -8.0, -170.0, 12.0),
    # g2: span >= 360 after shifting → collapses to the whole planet
    ("g2", -180.0, 0.0, 180.0, 1.0),
    ("g2", -179.0, 0.0, -1.0, 1.0),
    # g3: plain union, nothing crosses anything
    ("g3", 0.0, 0.0, 10.0, 10.0),
    ("g3", 20.0, 5.0, 30.0, 25.0),
    # g4: every box west of Greenwich → all shift +360, union shifts back
    ("g4", -170.0, 0.0, -160.0, 5.0),
    ("g4", -150.0, 2.0, -140.0, 8.0),
]

EXPECTED = {
    "g1": (170.0, -10.0, 190.0, 12.0),
    "g2": (-180.0, 0.0, 180.0, 1.0),
    "g3": (0.0, 0.0, 30.0, 25.0),
    "g4": (-170.0, 0.0, -140.0, 8.0),
}


def test_bbox_expand_union_branches(spark):
    df = spark.createDataFrame(
        ROWS, "grp string, xmin double, ymin double, xmax double, ymax double"
    )
    got = geo.bbox_expand_union(df, ["grp"]).toPandas().set_index("grp")
    for g, (x0, y0, x1, y1) in EXPECTED.items():
        row = got.loc[g]
        assert (
            row["bbox_xmin"], row["bbox_ymin"], row["bbox_xmax"], row["bbox_ymax"]
        ) == (x0, y0, x1, y1), g


def test_bbox_sql_mirror_agrees(spark):
    df = spark.createDataFrame(
        ROWS, "grp string, xmin double, ymin double, xmax double, ymax double"
    )
    got = (
        geo.bbox_expand_union(df, ["grp"])
        .toPandas()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    pdf = pd.DataFrame(ROWS, columns=["grp", "xmin", "ymin", "xmax", "ymax"])
    con = duckdb.connect()
    con.register("boxes", pdf)
    want = (
        con.execute(geo.sql_bbox_expand_union("select * from boxes"))
        .df()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns])
