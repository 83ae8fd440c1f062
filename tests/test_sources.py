"""Schema-enforced transcript sources: imposed schema (no inference
pass), malformed-record quarantine, key-invariant validation, and the
streaming reader feeding the incremental indexer."""

from __future__ import annotations

import os

import pytest

from es_indexer_spark.corpus import TRANSCRIPT_SCHEMA, synth_transcripts
from es_indexer_spark.sources import read_stream_transcripts, read_transcripts

GOOD_JSON = (
    '{"conv_id":"c1","turn_idx":0,"role":"user","text":"hello there",'
    '"tool":null,"ts":"2024-01-01T10:00:00"}'
)


def test_parquet_roundtrip_and_missing_column_error(spark, tmp_path):
    p = str(tmp_path / "tx")
    synth_transcripts(spark, 5, 3, seed=9).write.parquet(p)
    good, bad = read_transcripts(spark, p, format="parquet")
    assert good.count() == 15 and bad.count() == 0
    assert [f.name for f in good.schema.fields] == [
        f.name for f in TRANSCRIPT_SCHEMA.fields
    ]

    p2 = str(tmp_path / "short")
    synth_transcripts(spark, 2, 2, seed=9).drop("text").write.parquet(p2)
    with pytest.raises(ValueError, match="missing transcript columns"):
        read_transcripts(spark, p2, format="parquet")


def test_json_quarantines_malformed_and_invalid_rows(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    lines = [
        GOOD_JSON,
        '{"conv_id":"c1","turn_idx":1,"role":"assistant","text":"hi","tool":null,'
        '"ts":"2024-01-01T10:01:00"}',
        "{not valid json at all",                                   # parse error
        '{"conv_id":null,"turn_idx":2,"role":"user","text":"orphan",'
        '"tool":null,"ts":"2024-01-01T10:02:00"}',                  # null key
        '{"conv_id":"c2","turn_idx":-5,"role":"user","text":"bad idx",'
        '"tool":null,"ts":"2024-01-01T10:03:00"}',                  # negative idx
    ]
    src.write_text("\n".join(lines))
    good, bad = read_transcripts(spark, str(src), format="json")
    assert good.count() == 2
    reasons = sorted(r["reason"] for r in bad.collect())
    assert reasons == ["invalid_key", "invalid_key", "parse_error"]
    # good rows are fully typed
    assert dict(good.dtypes)["turn_idx"] == "int" and dict(good.dtypes)["ts"] == "timestamp"


def test_csv_source_reads_with_header(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text(
        "conv_id,turn_idx,role,text,tool,ts\n"
        "c1,0,user,hello world,,2024-01-01T10:00:00\n"
        "c1,1,assistant,general reply,,2024-01-01T10:01:00\n"
    )
    good, bad = read_transcripts(spark, str(src), format="csv")
    assert good.count() == 2 and bad.count() == 0
    assert good.filter("role = 'assistant'").count() == 1


def test_unsupported_format_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        read_transcripts(spark, str(tmp_path), format="avro")


def test_stream_source_feeds_incremental_index(spark, tmp_path):
    from es_indexer_spark.index.build import build_index
    from es_indexer_spark.query.engine import IndexSearcher
    from es_indexer_spark.streaming.incremental import incremental_index

    idx = str(tmp_path / "idx")
    build_index(spark, synth_transcripts(spark, 10, 4, seed=3), idx,
                n_buckets=8, n_segments=2)
    n0 = IndexSearcher(spark, idx).n_docs

    src = str(tmp_path / "in")
    os.makedirs(src)
    extra = synth_transcripts(spark, 14, 4, seed=3).filter(
        "conv_id >= 'conv00000010'"
    )
    extra.write.mode("overwrite").parquet(os.path.join(src, "d1"))

    stream = read_stream_transcripts(
        spark, src, format="parquet", recursiveFileLookup="true"
    )
    q = incremental_index(stream, idx, str(tmp_path / "ck"))
    q.awaitTermination(120)
    assert IndexSearcher(spark, idx).n_docs == n0 + 4 * 4


def test_write_corpus_caps_file_size_and_partitions(spark, tmp_path):
    from es_indexer_spark.sources import write_corpus

    df = synth_transcripts(spark, 50, 4, seed=4).coalesce(1)
    out = str(tmp_path / "corpus")
    write_corpus(df, out, partition_by=("role",), max_records_per_file=40)
    back = spark.read.parquet(out)
    assert back.count() == 200
    # partition dirs exist and every file respects the record cap
    import glob

    roles = {os.path.basename(p) for p in glob.glob(out + "/role=*")}
    assert {"role=user", "role=assistant"} <= roles
    for f in glob.glob(out + "/**/*.parquet", recursive=True):
        import pyarrow.parquet as pq

        assert pq.ParquetFile(f).metadata.num_rows <= 40, f


def test_dead_letter_idempotent_per_batch(spark, tmp_path):
    from es_indexer_spark.sources import write_dead_letter

    bad = spark.createDataFrame(
        [("{oops", "parse_error")], "raw string, reason string"
    )
    out = str(tmp_path / "dlq")
    write_dead_letter(bad, out, batch_id=7)
    write_dead_letter(bad, out, batch_id=7)  # replay overwrites, not dups
    back = spark.read.parquet(out)
    assert back.count() == 1
    assert set(back.columns) == {"raw", "reason", "quarantined_at", "batch"}


def test_streaming_json_quarantine_to_dead_letter(spark, tmp_path):
    """Review finding: a malformed line on a semi-structured stream must
    not poison-pill its epoch — the sink quarantines it to the dead
    letter dir and indexes the good rows."""
    from es_indexer_spark.index.build import build_index
    from es_indexer_spark.query.engine import IndexSearcher
    from es_indexer_spark.streaming.incremental import incremental_index

    idx = str(tmp_path / "idx")
    build_index(spark, synth_transcripts(spark, 5, 4, seed=8), idx,
                n_buckets=8, n_segments=2)
    n0 = IndexSearcher(spark, idx).n_docs

    src = tmp_path / "in"
    src.mkdir()
    (src / "drop1.jsonl").write_text(
        GOOD_JSON + "\n"
        + "{TOTALLY BROKEN\n"
        + '{"conv_id":null,"turn_idx":1,"role":"user","text":"x","tool":null,'
          '"ts":"2024-01-01T10:01:00"}\n'
    )
    stream = read_stream_transcripts(spark, str(src), format="json")
    dlq = str(tmp_path / "dlq")
    q = incremental_index(stream, idx, str(tmp_path / "ck"),
                          dead_letter_dir=dlq)
    q.awaitTermination(120)

    assert IndexSearcher(spark, idx).n_docs == n0 + 1  # only the good row
    bad = spark.read.parquet(dlq)
    reasons = sorted(r["reason"] for r in bad.collect())
    assert reasons == ["invalid_key", "parse_error"]


def test_dead_letter_modes_share_one_layout(spark, tmp_path):
    """Epoch and ad-hoc writes to the same DLQ path stay readable as one
    dataset (uniform batch=<key> hive layout)."""
    from es_indexer_spark.sources import write_dead_letter

    bad = spark.createDataFrame([("{oops", "parse_error")], "raw string, reason string")
    out = str(tmp_path / "dlq")
    write_dead_letter(bad, out, batch_id=3)
    write_dead_letter(bad, out)  # ad-hoc
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert {str(r["batch"]) for r in back.select("batch").collect()} == {"3", "adhoc"}
