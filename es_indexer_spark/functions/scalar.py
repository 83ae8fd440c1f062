"""Scalar function library — the reference's string/date/regex transforms
(SURVEY §2.9) as pure Spark column expressions (whole-stage codegen, no
Python)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Date normalization — StacCollectionMapperService.java:169-226: five
# regex-dispatched input shapes; missing month/day/time widen to the range
# edge (start -> T00:00:00 / Jan / day 1; end -> T23:59:59 / Dec / last
# day), local timezone -> UTC.
# ---------------------------------------------------------------------------

_FULL_TS = r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}"
_DATE_ONLY = r"^\d{4}-\d{2}-\d{2}$"
_YEAR_MONTH = r"^\d{4}-\d{2}$"
_YEAR_ONLY = r"^\d{4}$"


def normalize_date(col: Column | str, end: bool = False, tz: str = "Australia/Hobart") -> Column:
    """Regex-dispatched date widening + local->UTC conversion.

    ``end=False`` widens missing parts down (range start), ``end=True``
    widens up (range end) — mirroring the reference's
    ``convertDateToZonedDateTime`` start/end handling."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    t_edge = F.lit(" 23:59:59") if end else F.lit(" 00:00:00")
    date_only = F.concat(c, t_edge)
    ym = F.when(
        F.lit(end),
        # last day of month: next month's day 1 minus 1 day
        F.concat(
            F.date_format(
                F.last_day(F.to_date(F.concat(c, F.lit("-01")))), "yyyy-MM-dd"
            ),
            t_edge,
        ),
    ).otherwise(F.concat(c, F.lit("-01"), t_edge))
    y = F.when(F.lit(end), F.concat(c, F.lit("-12-31"), t_edge)).otherwise(
        F.concat(c, F.lit("-01-01"), t_edge)
    )
    local = (
        F.when(c.rlike(_FULL_TS), F.to_timestamp(F.substring(c.cast("string"), 1, 19).cast("string")))
        .when(c.rlike(_DATE_ONLY), F.to_timestamp(date_only))
        .when(c.rlike(_YEAR_MONTH), F.to_timestamp(ym))
        .when(c.rlike(_YEAR_ONLY), F.to_timestamp(y))
        .otherwise(F.lit(None).cast("timestamp"))
    )
    return F.to_utc_timestamp(local, tz)


# ---------------------------------------------------------------------------
# Citation versions — StacCollectionMapperService.java:263-297,339-345:
# "... for Version 2.1" -> extract + parse-to-double; latest version wins.
# ---------------------------------------------------------------------------

VERSION_RE = r"for Version (\d+(\.\d+)*)"


def extract_version(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    v = F.regexp_extract(c, VERSION_RE, 1)
    # parse-to-double: keep major.minor, drop deeper components (2.1.3 -> 2.1)
    return F.when(
        v != "", F.regexp_extract(v, r"^(\d+(\.\d+)?)", 1).cast("double")
    ).otherwise(F.lit(None).cast("double"))


def latest_version_citation(df: DataFrame, group_col: str, citation_col: str) -> DataFrame:
    """A4 max-by: per group, the citation with the highest parsed version."""
    return (
        df.withColumn("_v", F.coalesce(extract_version(citation_col), F.lit(-1.0)))
        .groupBy(group_col)
        .agg(F.max_by(citation_col, F.col("_v")).alias("latest_citation"),
             F.max("_v").alias("max_version"))
    )


# ---------------------------------------------------------------------------
# Status / delivery mode — SummariesUtils.java:19-37,
# DeliveryModeUtils.java:28-103.
# ---------------------------------------------------------------------------

def normalize_status(col: Column | str) -> Column:
    """complete->completed, 'on going'/'onGoing'->ongoing, lowercase."""
    c = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    c = F.regexp_replace(c, r"^complete$", "completed")
    c = F.regexp_replace(c, r"^on\s?going$", "ongoing")
    return c


def delivery_mode(status: Column, title: Column, abstract: Column, lineage: Column) -> Column:
    """Decision tree (DeliveryModeUtils.java:28-83): completed -> 'delayed';
    else real-time markers in title/abstract/lineage -> 'real-time';
    delayed markers -> 'delayed'; otherwise 'other'."""
    rt = r"(?i)real[- ]?time|\bnrt\b"
    delayed = r"(?i)delayed([- ]?mode)?"
    text = F.concat_ws(" ", title, abstract, lineage)
    return (
        F.when(normalize_status(status) == "completed", F.lit("delayed"))
        .when(text.rlike(rt), F.lit("real-time"))
        .when(text.rlike(delayed), F.lit("delayed"))
        .otherwise(F.lit("other"))
    )


# ---------------------------------------------------------------------------
# Keyword / label helpers — GcmdKeywordUtils.java:29-39,
# StacCollectionMapperService.java:606-621, LinkUtils.java:17-77.
# ---------------------------------------------------------------------------

def last_keyword_segment(col: Column | str) -> Column:
    """Last segment after '|' or '>' separators, trimmed+lowered
    (GcmdKeywordUtils.getLastWord)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.element_at(F.split(c, r"[|>]"), -1)))


def split_group_names(col: Column | str) -> Column:
    """Comma split + lower + trim (StacCollectionMapperService.java:606-621)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(F.split(F.lower(c), ","), lambda s: F.trim(s))


PROTOCOL_RELATION = {
    "wms": "wms", "wfs": "data", "http--download": "data",
    "ftp": "data", "oai-pmh": "metadata", "doi": "describedby",
}


def protocol_relation(col: Column | str) -> Column:
    """Protocol -> link relation mapping table (LinkUtils.java:17-77) as a
    when-chain (broadcast-map-join equivalent for a constant dimension)."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    out = F.lit("related")
    for proto, rel in reversed(list(PROTOCOL_RELATION.items())):
        out = F.when(c.contains(proto), F.lit(rel)).otherwise(out)
    return out


# ---------------------------------------------------------------------------
# S14 oversize-document splitter — IndexCloudOptimizedServiceImpl.java:212-232:
# split a row whose nested array exceeds max_items into chunk rows.
# ---------------------------------------------------------------------------

def split_oversize(df: DataFrame, array_col: str, max_items: int) -> DataFrame:
    """Explode an oversize array column into (chunk_idx, chunk) rows of at
    most max_items elements each; rows within the limit become chunk 0."""
    n_chunks = F.ceil(F.size(array_col) / F.lit(max_items)).cast("int")
    return df.select(
        "*",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
                lambda i: F.slice(F.col(array_col), i * max_items + 1, max_items),
            )
        ).alias("chunk_idx", "chunk"),
    ).drop(array_col)
