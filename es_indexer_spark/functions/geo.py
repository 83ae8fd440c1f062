"""Bounding-box expand-union with antimeridian handling (SURVEY §2.4 A6).

Re-expresses ``StacUtils.createStacBBox`` (reference
``indexer/src/main/java/au/org/aodn/esindexer/utils/StacUtils.java:47-126``)
as pure Spark column expressions — a ``groupBy().agg()`` over ``when``
arithmetic, so it whole-stage-codegens and scales like any hash aggregate
(one shuffle on the group key, map-side partial min/max):

1. per-envelope normalize: boxes entirely west of Greenwich
   (``maxX < 0``) shift to [180, 360] so a region split across the
   antimeridian unions into one continuous range (StacUtils.java:63-71);
2. union = (min x, min y, max x, max y) over the normalized boxes
   (``Envelope.expandToInclude``);
3. post-process (StacUtils.java:82-97): span >= 360 collapses to the
   global box [-180, 180]; otherwise shift edges > 180 back by 360, and
   if that flips the order (a genuine antimeridian-crossing union) add
   360 to maxX so the box stays forward-directed (maxX may legitimately
   exceed 180);
4. round HALF_UP to 10 decimals (``BigDecimal.setScale(10, HALF_UP)``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 10  # StacUtils.SCALE


def _westward_shift(xmax: Column) -> Column:
    return F.when(xmax < 0, F.lit(360.0)).otherwise(F.lit(0.0))


def bbox_expand_union(
    df: DataFrame,
    group_cols: list[str],
    xmin: str = "xmin",
    ymin: str = "ymin",
    xmax: str = "xmax",
    ymax: str = "ymax",
) -> DataFrame:
    """Per-group overall bbox with the reference's antimeridian semantics.

    Returns one row per group: (group_cols..., bbox_xmin, bbox_ymin,
    bbox_xmax, bbox_ymax), all doubles rounded to 10 decimals."""
    shift = _westward_shift(F.col(xmax))
    agg = df.groupBy(*group_cols).agg(
        F.min(F.col(xmin) + shift).alias("_gx0"),
        F.max(F.col(xmax) + shift).alias("_gx1"),
        F.min(F.col(ymin)).alias("_gy0"),
        F.max(F.col(ymax)).alias("_gy1"),
    )
    whole_planet = (F.col("_gx1") - F.col("_gx0")) >= 360.0
    sx0 = F.when(F.col("_gx0") > 180.0, F.col("_gx0") - 360.0).otherwise(F.col("_gx0"))
    sx1 = F.when(F.col("_gx1") > 180.0, F.col("_gx1") - 360.0).otherwise(F.col("_gx1"))
    sx1 = F.when(sx1 < sx0, sx1 + 360.0).otherwise(sx1)
    out_x0 = F.when(whole_planet, F.lit(-180.0)).otherwise(sx0)
    out_x1 = F.when(whole_planet, F.lit(180.0)).otherwise(sx1)
    return agg.select(
        *group_cols,
        F.round(out_x0, _SCALE).alias("bbox_xmin"),
        F.round(F.col("_gy0"), _SCALE).alias("bbox_ymin"),
        F.round(out_x1, _SCALE).alias("bbox_xmax"),
        F.round(F.col("_gy1"), _SCALE).alias("bbox_ymax"),
    )


def sql_bbox_expand_union(
    inner: str,
    group_col: str = "grp",
) -> str:
    """DuckDB mirror of ``bbox_expand_union`` over a subquery ``inner``
    exposing (group_col, xmin, ymin, xmax, ymax)."""
    return f"""
with b as ({inner}),
norm as (
  select {group_col},
         xmin + case when xmax < 0 then 360.0 else 0.0 end as nxmin,
         xmax + case when xmax < 0 then 360.0 else 0.0 end as nxmax,
         ymin, ymax
  from b
), agg as (
  select {group_col},
         min(nxmin) as gx0, max(nxmax) as gx1,
         min(ymin) as gy0, max(ymax) as gy1
  from norm group by {group_col}
), shifted as (
  select {group_col}, gx0, gx1, gy0, gy1,
         case when gx0 > 180.0 then gx0 - 360.0 else gx0 end as sx0,
         case when gx1 > 180.0 then gx1 - 360.0 else gx1 end as sx1
  from agg
)
select {group_col},
       round(case when gx1 - gx0 >= 360.0 then -180.0 else sx0 end, 10) as bbox_xmin,
       round(gy0, 10) as bbox_ymin,
       round(case when gx1 - gx0 >= 360.0 then 180.0
                  when sx1 < sx0 then sx1 + 360.0
                  else sx1 end, 10) as bbox_xmax,
       round(gy1, 10) as bbox_ymax
from shifted
"""
