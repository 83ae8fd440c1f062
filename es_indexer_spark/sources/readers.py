"""Schema-enforced transcript sources: parquet / JSON-lines / CSV, batch
and streaming, with malformed-record quarantine.

The reference's ingest surface is HTTP paging out of GeoNetwork
(``GeoNetworkServiceImpl.java:585-603`` — scoped out per SURVEY §2.1);
its Spark-native analogue is "read a table of transcript rows from
whatever format the lake holds, enforce the schema, and never let a
malformed record poison the build". Design points:

- the TRANSCRIPT_SCHEMA is IMPOSED, not inferred — inference samples the
  input (an extra pass at 100 TB) and drifts with the data; an imposed
  schema is one scan and stable;
- semi-structured formats (JSON/CSV) read in PERMISSIVE mode with a
  ``_corrupt_record`` column: malformed lines become quarantine rows
  instead of job failures (the Spark rendering of the reference's
  retry-and-continue ingest loop). ``read_transcripts`` returns
  ``(good, bad)`` so callers index the good rows and route the bad ones
  to a dead-letter sink;
- validation beyond parsing (null keys, negative turn indices) is one
  boolean column expression — rows, not exceptions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corpus import TRANSCRIPT_SCHEMA

_CORRUPT = "_corrupt_record"


def _schema_with_corrupt() -> T.StructType:
    return T.StructType(
        TRANSCRIPT_SCHEMA.fields + [T.StructField(_CORRUPT, T.StringType(), True)]
    )


def _invalid():  # built lazily: Column construction needs a live session
    # covers cast failures too: the schema's non-null columns arriving
    # NULL (e.g. a garbage ts string cast to timestamp) are quarantined,
    # not silently nulled into the corpus
    return (
        F.col("conv_id").isNull()
        | F.col("turn_idx").isNull()
        | (F.col("turn_idx") < 0)
        | F.col("text").isNull()
        | F.col("role").isNull()
        | F.col("ts").isNull()
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a (possibly corrupt-columned) transcript frame into
    ``(good, bad)``: good rows in TRANSCRIPT_SCHEMA column order; bad
    rows as (raw, reason) for the dead-letter sink. Works on batch reads
    AND on the micro-batch frames inside a streaming foreachBatch — the
    one quarantine implementation both paths share."""
    parsed_bad = None
    if _CORRUPT in df.columns:
        # Spark refuses plans whose referenced columns are ONLY the
        # internal corrupt column, and column pruning (e.g. under a bare
        # count()) strips everything a select references — the filter
        # must irreducibly touch a parsed column. length(concat_ws(...))
        # >= 0 is always true, never null, and never folded away.
        touch_parsed = F.length(F.concat_ws("", F.col("conv_id"), F.col("role"))) >= 0
        parsed_bad = (
            df.filter(F.col(_CORRUPT).isNotNull() & touch_parsed)
            .select(
                F.coalesce(F.col(_CORRUPT), F.col("conv_id")).alias("raw"),
                F.lit("parse_error").alias("reason"),
            )
        )
        df = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    cols = [f.name for f in TRANSCRIPT_SCHEMA.fields]
    good = df.filter(~_invalid()).select(*cols)
    invalid = df.filter(_invalid()).select(
        F.to_json(F.struct(*cols)).alias("raw"),
        F.lit("invalid_key").alias("reason"),
    )
    bad = parsed_bad.unionByName(invalid) if parsed_bad is not None else invalid
    return good, bad


def read_transcripts(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    **options,
) -> tuple[DataFrame, DataFrame]:
    """Read a transcript table with the schema imposed; returns
    ``(good, bad)``: valid rows in TRANSCRIPT_SCHEMA column order, and
    quarantine rows (parse failures and key-invariant violations) with a
    ``reason`` column for the dead-letter sink."""
    fmt = format.lower()
    if fmt == "parquet":
        df = spark.read.options(**options).parquet(path)
        missing = [f.name for f in TRANSCRIPT_SCHEMA.fields if f.name not in df.columns]
        if missing:
            raise ValueError(f"parquet source missing transcript columns: {missing}")
        typed = df.select(
            *[F.col(f.name).cast(f.dataType) for f in TRANSCRIPT_SCHEMA.fields]
        )
    elif fmt in ("json", "csv"):
        reader = (
            spark.read.schema(_schema_with_corrupt())
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
            .options(**({"header": "true"} if fmt == "csv" else {}), **options)
        )
        typed = reader.json(path) if fmt == "json" else reader.csv(path)
    else:
        raise ValueError(f"unsupported transcript source format: {format}")

    return split_quarantine(typed)


def read_stream_transcripts(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    **options,
) -> DataFrame:
    """Streaming source with the same imposed schema (files appearing
    under ``path`` become micro-batches); feed the result to
    ``streaming.incremental.incremental_index`` (optionally with
    ``dedup=``). Parse quarantine for streaming JSON/CSV follows the same
    PERMISSIVE + corrupt-column convention — filter it in the caller's
    foreachBatch if the stream is semi-structured."""
    fmt = format.lower()
    reader = spark.readStream.schema(
        TRANSCRIPT_SCHEMA if fmt == "parquet" else _schema_with_corrupt()
    ).options(**options)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.option("mode", "PERMISSIVE").json(path)
    if fmt == "csv":
        return reader.option("mode", "PERMISSIVE").option("header", "true").csv(path)
    raise ValueError(f"unsupported transcript source format: {format}")
