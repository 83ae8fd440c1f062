"""Resume & atomic-publish behaviour — the analogue of the reference's
``verifyRunningIndexAndResumeFeature`` (IndexerServiceIT.java:249-…): fail
mid-index, verify the in-progress version is preserved, resume from the
per-partition checkpoints, and end with an index identical to a clean build."""

from __future__ import annotations

import os

import pytest
import shutil

from es_indexer_spark.corpus import synth_transcripts
from es_indexer_spark.index import catalog
from es_indexer_spark.index.build import build_index
from es_indexer_spark.query.engine import IndexSearcher


def _corpus(spark):
    return synth_transcripts(spark, n_convs=60, turns_per_conv=5, seed=11)


def test_resume_skips_completed_batches(spark, tmp_path):
    idx = str(tmp_path / "idx")
    r1 = build_index(spark, _corpus(spark), idx, n_buckets=8, n_segments=4,
                     n_batches=4, publish=False)
    assert r1.batches_run == 4

    # simulate a crash after batch 1: delete checkpoints + data of batches 2-3
    ck = os.path.join(r1.version_dir, "checkpoints")
    for b in (2, 3):
        os.remove(os.path.join(ck, f"batch_{b:05d}.json"))
        shutil.rmtree(os.path.join(r1.version_dir, "postings", f"batch={b}"))
    os.remove(os.path.join(ck, "term_stats.json"))

    r2 = build_index(spark, _corpus(spark), idx, n_buckets=8, n_segments=4,
                     n_batches=4)
    assert r2.version_dir == r1.version_dir  # resumed the -running version
    assert r2.batches_skipped == 2 and r2.batches_run == 2

    # resumed index answers queries identically to a from-scratch build
    idx2 = str(tmp_path / "idx2")
    build_index(spark, _corpus(spark), idx2, n_buckets=8, n_segments=4, n_batches=1)
    a = IndexSearcher(spark, idx).search(["the", "baco"], k=20)
    b = IndexSearcher(spark, idx2).search(["the", "baco"], k=20)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()


def test_publish_is_atomic_pointer(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(spark, _corpus(spark), idx, n_buckets=8, n_segments=2)
    v1 = catalog.current_version_dir(idx)
    # second build publishes a new version; CURRENT flips, v1 untouched
    build_index(spark, _corpus(spark), idx, n_buckets=8, n_segments=2, resume=False)
    v2 = catalog.current_version_dir(idx)
    assert v1 != v2 and os.path.isdir(v1)
    # old version still readable (blue/green)
    old = IndexSearcher(spark, idx, version_dir=v1)
    assert len(old.search(["the"], k=3)) > 0


def test_checkpoint_metrics_lineage(spark, tmp_path):
    idx = str(tmp_path / "idx")
    r = build_index(spark, _corpus(spark), idx, n_buckets=8, n_segments=4, n_batches=2)
    ck = os.path.join(r.version_dir, "checkpoints")
    total_turns = total_postings = 0
    for b in range(2):
        m = catalog.read_json(os.path.join(ck, f"batch_{b:05d}.json"))
        assert m["turns_tokenized"] > 0
        assert m["postings_emitted"] > 0
        assert m["bytes_compressed"] > 0
        assert set(m["segments"]) and all(
            v["postings"] > 0 for v in m["segments"].values()
        )
        total_turns += m["turns_tokenized"]
        total_postings += m["postings_emitted"]
    assert total_turns == r.n_docs
    # postings emitted == number of distinct (term, doc) pairs
    import duckdb

    flat = duckdb.sql(
        f"""
        select count(*) from (
          select distinct doc_ord, term from (
            select doc_ord, unnest(regexp_extract_all(lower(text),
                   '[\\p{{L}}\\p{{N}}]+')) as term
            from parquet_scan('{r.version_dir}/doc_stats/*/*.parquet')
          )
        )
        """
    ).fetchone()[0]
    assert total_postings == flat


def test_validation_gate(spark, tmp_path):
    from es_indexer_spark.index.validate import ValidationError, validate_against_source

    idx = str(tmp_path / "idx")
    src = _corpus(spark)
    r = build_index(spark, src, idx, n_buckets=8, n_segments=2, validate_source=True)
    assert r.metrics["validation"]["text_equality"] is True
    assert r.metrics["validation"]["source_rows"] == r.n_docs
    assert r.metrics["compression_ratio"] > 1.5  # delta+varint beats raw 12B
    # a diverged source must fail the gate
    with pytest.raises(ValidationError):
        validate_against_source(
            spark, src.limit(10), r.version_dir
        )
