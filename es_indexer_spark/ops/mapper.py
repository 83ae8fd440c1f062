"""P1 — the wide mapping projection, the reference's central transform.

``StacCollectionMapperService.mapToSTACCollection``
(``indexer/src/main/java/au/org/aodn/esindexer/service/
StacCollectionMapperService.java:40-71``) turns one source record into a
~25-field index document via MapStruct ``@Mapping`` methods (uuid, title,
description, extent.bbox, extent.temporal, contacts, themes, languages,
links, license, providers, citation, summaries.*). Here that is ONE wide
``select()`` of pure column expressions — whole-stage codegen end to end,
no Python — composing the scalar library the individual mappings were
re-expressed into (``functions/scalar.py``: date widening, status
normalization, delivery mode, citation version, keyword segmenting, link
relations).

The reference's inputs are XML facets; the engine's input table is the
documents/transcript shape, so each facet is DERIVED deterministically
from (doc_id, text, lang, source, n_chars) with integer/string arithmetic
that the DuckDB oracle reproduces verbatim — the driver gate then checks
all ~25 computed columns value-exactly, which is precisely what the
reference's STRICT JSONAssert golden files do
(``StacCollectionMapperServiceTest.java:107-115``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import scalar
from .textstats import tokens_col

PROTOS = ["wms", "wfs", "http--download", "ftp", "oai-pmh", "doi"]
LICENSES = ["CC-BY-4.0", "CC-BY-NC", "public-domain", "unknown"]
STATUSES = ["Complete", "onGoing", "completed", "on going", "Historical"]
EPOCH = 1_700_000_000


def map_to_index_document(df: DataFrame) -> DataFrame:
    """documents-shaped input → ~25-column index document (one select)."""
    d = F.col("doc_id")
    toks = tokens_col("text")
    md5 = F.md5(d.cast("string"))
    uuid = F.concat_ws(
        "-",
        F.substring(md5, 1, 8), F.substring(md5, 9, 4), F.substring(md5, 13, 4),
        F.substring(md5, 17, 4), F.substring(md5, 21, 12),
    )
    title = F.concat_ws(" ", F.slice(toks, 1, 6))
    description = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    xmin = (d % 340 - 170).cast("double")
    xmax = (d % 340 - 170 + d % 9 + 1).cast("double")
    ymin = (d % 160 - 85).cast("double")
    ymax = (d % 160 - 85 + d % 11).cast("double")
    ym = F.format_string("%04d-%02d", (d % 20 + 2000).cast("int"), (d % 12 + 1).cast("int"))
    proto = F.element_at(F.array(*[F.lit(p) for p in PROTOS]), (d % 6 + 1).cast("int"))
    status_raw = F.element_at(
        F.array(*[F.lit(s) for s in STATUSES]), (d % 5 + 1).cast("int")
    )
    citation = F.concat(
        F.lit("Cited dataset "), d.cast("string"), F.lit(" for Version "),
        (d % 4).cast("string"), F.lit("."), (d % 10).cast("string"),
    )
    keyword = F.concat(F.lit("earth science|"), F.col("source"), F.lit(">"), F.col("lang"))
    statement = F.substring(description, 1, 80)
    status = scalar.normalize_status(status_raw)
    version = scalar.extract_version(citation)
    link_rel = scalar.protocol_relation(proto)
    n_tokens = F.size(toks)
    completeness = (
        F.when(title != "", 15).otherwise(0)
        + F.when(F.length(description) >= 100, 25).otherwise(0)
        + F.when(link_rel != "related", 10).otherwise(0)
        + F.when(version.isNotNull(), 10).otherwise(0)
        + F.when(status == "completed", 10).otherwise(0)
        + F.when(n_tokens >= 20, 10).otherwise(0)
        + F.when(xmax > xmin, 20).otherwise(0)
    )
    return df.select(
        uuid.alias("uuid"),                                         # mapUUID
        title.alias("title"),                                       # mapTitle
        description.alias("description"),                           # mapDescription
        xmin.alias("bbox_xmin"), ymin.alias("bbox_ymin"),           # mapExtentBbox
        xmax.alias("bbox_xmax"), ymax.alias("bbox_ymax"),
        scalar.normalize_date(ym, end=False, tz="UTC").alias("temporal_start"),
        scalar.normalize_date(ym, end=True, tz="UTC").alias("temporal_end"),
        F.lower(F.col("lang")).alias("languages"),                  # mapLanguages
        link_rel.alias("link_rel"),                                 # mapLinks
        F.element_at(
            F.array(*[F.lit(x) for x in LICENSES]), (d % 4 + 1).cast("int")
        ).alias("license"),                                         # mapLicense
        citation.alias("citation"),                                 # mapCitation
        version.alias("citation_version"),
        status.alias("status"),                                     # summaries.status
        F.lower(F.col("source")).alias("scope"),                    # summaries.scope
        (F.col("n_chars") % 5 + 1).cast("int").alias("credits_n"),  # summaries.credits
        F.concat(                                                    # summaries.geometry
            F.lit("POINT ("), (d % 340 - 170).cast("string"),
            F.lit(" "), (d % 160 - 85).cast("string"), F.lit(")"),
        ).alias("geometry_wkt"),
        scalar.delivery_mode(status_raw, title, description, statement)
        .alias("update_frequency"),                                 # summaries.updateFrequency
        F.concat(                                                    # summaries.datasetProvider
            F.upper(F.substring(F.col("source"), 1, 1)), F.expr("substring(source, 2)")
        ).alias("dataset_provider"),
        F.array_join(
            scalar.split_group_names(
                F.concat(F.col("source"), F.lit(","), F.col("lang"))
            ), ","
        ).alias("dataset_group"),                                   # summaries.datasetGroup
        scalar.last_keyword_segment(keyword).alias("theme_leaf"),   # mapThemes
        statement.alias("statement"),                               # summaries.statement
        F.timestamp_seconds(EPOCH + d * 3600).alias("creation"),    # summaries.creation
        F.timestamp_seconds(EPOCH + d * 3600 + d % 97 * 60)
        .alias("revision"),                                         # summaries.revision
        n_tokens.cast("int").alias("n_tokens"),                     # features.count
        completeness.cast("int").alias("completeness_score"),       # ranking weight sum
    )


def sql_index_document(table: str = "documents") -> str:
    """DuckDB mirror of ``map_to_index_document`` (identical derivations)."""
    toks = "regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')"
    protos = ", ".join(repr(p) for p in PROTOS)
    licenses = ", ".join(repr(x) for x in LICENSES)
    statuses = ", ".join(repr(s) for s in STATUSES)
    return f"""
with base as (
  select doc_id as d, text, lang, source, n_chars,
         md5(doc_id::varchar) as h,
         {toks} as toks,
         regexp_replace(trim(text), '\\s+', ' ', 'g') as description,
         printf('%04d-%02d', (doc_id % 20 + 2000)::int, (doc_id % 12 + 1)::int) as ym,
         ([{protos}])[(doc_id % 6 + 1)::int] as proto,
         ([{statuses}])[(doc_id % 5 + 1)::int] as status_raw,
         'Cited dataset ' || doc_id || ' for Version '
            || (doc_id % 4) || '.' || (doc_id % 10) as citation
  from {table}
), derived as (
  select *,
    array_to_string(toks[1:6], ' ') as title,
    substr(description, 1, 80) as statement,
    regexp_replace(regexp_replace(lower(trim(status_raw)),
                   '^complete$', 'completed'),
                   '^on\\s?going$', 'ongoing') as status,
    case when regexp_extract(citation, 'for Version (\\d+(\\.\\d+)*)', 1) <> ''
         then regexp_extract(regexp_extract(citation, 'for Version (\\d+(\\.\\d+)*)', 1),
                             '^(\\d+(\\.\\d+)?)', 1)::double
         else null end as citation_version,
    case when contains(lower(proto), 'wms') then 'wms'
         when contains(lower(proto), 'wfs') then 'data'
         when contains(lower(proto), 'http--download') then 'data'
         when contains(lower(proto), 'ftp') then 'data'
         when contains(lower(proto), 'oai-pmh') then 'metadata'
         when contains(lower(proto), 'doi') then 'describedby'
         else 'related' end as link_rel,
    (d % 340 - 170)::double as bbox_xmin,
    (d % 340 - 170 + d % 9 + 1)::double as bbox_xmax,
    (d % 160 - 85)::double as bbox_ymin,
    (d % 160 - 85 + d % 11)::double as bbox_ymax,
    len(toks) as n_tokens
  from base
)
select
  substr(h,1,8) || '-' || substr(h,9,4) || '-' || substr(h,13,4) || '-'
    || substr(h,17,4) || '-' || substr(h,21,12) as uuid,
  title,
  description,
  bbox_xmin, bbox_ymin, bbox_xmax, bbox_ymax,
  strptime(ym || '-01 00:00:00', '%Y-%m-%d %H:%M:%S') as temporal_start,
  last_day(strptime(ym || '-01', '%Y-%m-%d'))
    + interval '23 hours 59 minutes 59 seconds' as temporal_end,
  lower(lang) as languages,
  link_rel,
  ([{licenses}])[(d % 4 + 1)::int] as license,
  citation,
  citation_version,
  status,
  lower(source) as scope,
  (n_chars % 5 + 1)::int as credits_n,
  'POINT (' || (d % 340 - 170) || ' ' || (d % 160 - 85) || ')' as geometry_wkt,
  case when status = 'completed' then 'delayed'
       when regexp_matches(title || ' ' || description || ' ' || statement,
                           '(?i)real[- ]?time|\\bnrt\\b') then 'real-time'
       when regexp_matches(title || ' ' || description || ' ' || statement,
                           '(?i)delayed([- ]?mode)?') then 'delayed'
       else 'other' end as update_frequency,
  upper(substr(source, 1, 1)) || substr(source, 2) as dataset_provider,
  trim(lower(source)) || ',' || trim(lower(lang)) as dataset_group,
  lower(trim(list_extract(string_split_regex(
      'earth science|' || source || '>' || lang, '[|>]'), -1))) as theme_leaf,
  statement,
  make_timestamp(({EPOCH}::bigint + d * 3600) * 1000000) as creation,
  make_timestamp(({EPOCH}::bigint + d * 3600 + d % 97 * 60) * 1000000) as revision,
  n_tokens::int as n_tokens,
  (case when title <> '' then 15 else 0 end
   + case when length(description) >= 100 then 25 else 0 end
   + case when link_rel <> 'related' then 10 else 0 end
   + case when citation_version is not null then 10 else 0 end
   + case when status = 'completed' then 10 else 0 end
   + case when n_tokens >= 20 then 10 else 0 end
   + case when bbox_xmax > bbox_xmin then 20 else 0 end)::int as completeness_score
from derived
"""
