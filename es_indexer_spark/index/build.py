"""Distributed inverted-index build — the Spark re-expression of the
reference's bulk indexing path (``IndexerMetadataServiceImpl
.indexAllMetadataRecordsFromGeoNetwork``, IndexerMetadataServiceImpl.java:476-662:
scan → transform → analyze → batch → bulk upsert → validate → atomic alias
swap), with the Lucene posting-format work ES did for the reference
(inverted index + compressed postings + skip/impact data, implied by every
``"type": "text"`` field in ``portal_records_index_schema.json``) done here
from scratch.

Dataflow (all DataFrame ops; Python only in Arrow-vectorized kernels):

1. doc ordinals: dense int64 rank in stable (conv_id, turn_idx) order
   (two-pass range-partition scheme in ``corpus.assign_doc_ordinals``).
2. ``doc_stats`` parquet: (doc_ord, doc_id, conv_id, turn_idx, role, tool,
   dl, text), range-partitioned & sorted by doc_ord — the docvalues/norms
   + stored-fields analogue.
3. tokenize pass (``mapInPandas``) over doc_stats slices → flat rows
   (doc_ord, seg, tbucket, term, tf, dl[, positions]) with map-side tf
   combine inside each Arrow batch (one shuffle row per distinct
   (doc, term), not per token — what keeps shuffle volume sane at 10^12
   turns).
4. shuffle-by-term: ``repartition(n, "tbucket", "seg")``. ``seg`` is a
   contiguous doc-ordinal range, so a hot term's postings (stop-word-like
   df) are split across segments and re-assembled at query time by simple
   ordered concatenation — the salted-key skew mitigation demanded by the
   north_rule, with zero-cost merge because the salt ranges are disjoint
   and ordered.
5. per-partition vectorized encode (numpy, ``codec``): delta+varint doc
   gaps, varint tfs, per-128-posting block metadata (last_doc, max_tf,
   min_dl) for block-max pruning; one encode pass per Arrow batch, all
   terms at once.
6. write ``postings`` parquet partitioned by (batch, tbucket) — term
   lookups prune to one bucket directory, and each batch directory is
   overwritten idempotently so a re-run after a mid-batch crash cannot
   duplicate rows (the retry-until-success idempotence of
   ``IndexServiceImpl.java:167-221``, done the Spark way).
7. per-batch checkpoint JSON with per-segment lineage + metrics (turns
   tokenized, postings emitted, bytes compressed) — the ``-running`` alias
   + ``beginWithUuid`` resume marker analogue
   (``IndexerMetadataServiceImpl.java:478-523``). Resume skips completed
   batches.
8. ``term_stats`` (term → df, total_tf, n_chunks) sorted by term — the
   term dictionary (prefix scans = parquet row-group range pruning).
9. validation gate (indexed count == source count; stricter than the
   reference's >=90 % at ``IndexerMetadataServiceImpl.java:651-655``) then
   atomic CURRENT swap (``catalog.publish_version``).
"""

from __future__ import annotations

import os
import time
import zlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import codec
from ..analysis import term_freqs_batch
from ..corpus import assign_doc_ordinals, with_doc_ids
from . import catalog

FLAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_ord", T.LongType(), False),
        T.StructField("seg", T.IntegerType(), False),
        T.StructField("tbucket", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), True),
    ]
)

ENC_SCHEMA = T.StructType(
    [
        T.StructField("tbucket", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("seg", T.IntegerType(), False),
        T.StructField("min_doc", T.LongType(), False),
        T.StructField("max_doc", T.LongType(), False),
        T.StructField("df_chunk", T.LongType(), False),
        T.StructField("sum_tf", T.LongType(), False),
        T.StructField("doc_bytes", T.BinaryType(), False),
        T.StructField("tf_bytes", T.BinaryType(), False),
        T.StructField("block_last", T.ArrayType(T.LongType()), False),
        T.StructField("block_max_tf", T.ArrayType(T.IntegerType()), False),
        T.StructField("block_min_dl", T.ArrayType(T.IntegerType()), False),
        T.StructField("pos_bytes", T.BinaryType(), True),
    ]
)


def term_bucket(term: str, n_buckets: int) -> int:
    """Deterministic term → directory bucket (crc32 — stable across runs,
    processes and Spark/DuckDB, unlike builtin hash)."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def encode_chunks(pdf: pd.DataFrame, with_positions: bool = False) -> pd.DataFrame:
    """Vectorized encode of one Arrow batch of flat rows, pre-sorted by
    (term, seg, doc_ord). Emits one posting-chunk row per (term, seg) run
    in the batch. A (term, seg) group that spans Arrow batches simply
    yields several chunk rows with disjoint ordered doc ranges — readers
    concatenate chunks sorted by (seg, min_doc), so batch splits are
    harmless (and bound block arrays to <=512 entries per chunk)."""
    n = len(pdf)
    if n == 0:
        return pd.DataFrame({f.name: [] for f in ENC_SCHEMA.fields})
    terms = pdf["term"].to_numpy(object)
    segs = pdf["seg"].to_numpy(np.int32)
    docs = pdf["doc_ord"].to_numpy(np.int64)
    tfs = pdf["tf"].to_numpy(np.int64)
    dls = pdf["dl"].to_numpy(np.int64)

    new_group = np.ones(n, dtype=bool)
    new_group[1:] = (terms[1:] != terms[:-1]) | (segs[1:] != segs[:-1])
    gstarts = np.flatnonzero(new_group)
    gends = np.append(gstarts[1:], n)
    glens = gends - gstarts

    gaps = codec.delta_encode_segmented(docs, gstarts)
    doc_nb = codec.varint_nbytes(gaps)
    doc_buf = codec.varint_encode(gaps)
    doc_gb = np.add.reduceat(doc_nb, gstarts)
    doc_off = np.concatenate(([0], np.cumsum(doc_gb)[:-1]))

    utf = tfs.astype(np.uint64)
    tf_nb = codec.varint_nbytes(utf)
    tf_buf = codec.varint_encode(utf)
    tf_gb = np.add.reduceat(tf_nb, gstarts)
    tf_off = np.concatenate(([0], np.cumsum(tf_gb)[:-1]))

    # per-group blocks of BLOCK_SIZE postings
    pos_in_g = np.arange(n, dtype=np.int64) - np.repeat(gstarts, glens)
    bstarts = np.flatnonzero(pos_in_g % codec.BLOCK_SIZE == 0)
    bends = np.append(bstarts[1:], n)
    blk_last = docs[bends - 1]
    blk_maxtf = np.maximum.reduceat(tfs, bstarts).astype(np.int32)
    blk_mindl = np.minimum.reduceat(dls, bstarts).astype(np.int32)
    gid = np.cumsum(new_group) - 1
    nblocks = np.bincount(gid[bstarts], minlength=len(gstarts))
    bsplit = np.cumsum(nblocks)[:-1]

    if with_positions and "positions" in pdf.columns:
        pos_lists = pdf["positions"].to_numpy(object)
        pos_bytes: list[bytes | None] = [
            codec.encode_positions([np.asarray(pos_lists[i]) for i in range(s, e)])
            for s, e in zip(gstarts, gends)
        ]
    else:
        pos_bytes = [None] * len(gstarts)

    return pd.DataFrame(
        {
            "tbucket": pdf["tbucket"].to_numpy(np.int32)[gstarts],
            "term": terms[gstarts],
            "seg": segs[gstarts],
            "min_doc": docs[gstarts],
            "max_doc": docs[gends - 1],
            "df_chunk": glens.astype(np.int64),
            "sum_tf": np.add.reduceat(tfs, gstarts).astype(np.int64),
            "doc_bytes": [bytes(doc_buf[o : o + l]) for o, l in zip(doc_off, doc_gb)],
            "tf_bytes": [bytes(tf_buf[o : o + l]) for o, l in zip(tf_off, tf_gb)],
            "block_last": np.split(blk_last, bsplit),
            "block_max_tf": np.split(blk_maxtf, bsplit),
            "block_min_dl": np.split(blk_mindl, bsplit),
            "pos_bytes": pos_bytes,
        }
    )


def _tokenize_flat(
    docs: DataFrame, n_docs: int, n_segments: int, n_buckets: int, with_positions: bool
) -> DataFrame:
    """doc_stats slice → flat (doc_ord, seg, tbucket, term, tf, dl) rows."""

    def gen(batches):
        for pdf in batches:
            g = term_freqs_batch(pdf["text"], with_positions=with_positions)
            if len(g) == 0:
                continue
            ords = pdf["doc_ord"].to_numpy(np.int64)[g["row"].to_numpy(np.int64)]
            out = pd.DataFrame(
                {
                    "doc_ord": ords,
                    "seg": np.minimum(
                        ords * n_segments // n_docs, n_segments - 1
                    ).astype(np.int32),
                    "term": g["term"].to_numpy(object),
                    "tf": g["tf"].to_numpy(np.int32),
                    "dl": g["dl"].to_numpy(np.int32),
                }
            )
            # bucket via the batch's unique terms (vocab-bounded, not row-bounded)
            lut = {t: term_bucket(t, n_buckets) for t in pd.unique(out["term"])}
            out["tbucket"] = out["term"].map(lut).astype(np.int32)
            out["positions"] = (
                g["positions"].to_numpy(object) if with_positions else None
            )
            yield out[[f.name for f in FLAT_SCHEMA.fields]]

    return docs.select("doc_ord", "text").mapInPandas(gen, FLAT_SCHEMA)


@dataclass
class BuildResult:
    version_dir: str
    n_docs: int
    avgdl: float
    total_tokens: int
    batches_run: int = 0
    batches_skipped: int = 0
    metrics: dict = field(default_factory=dict)


def _doc_range_for_batch(b: int, n_batches: int, n_segments: int, n_docs: int):
    """Contiguous doc_ord range covered by batch b (seg is a pure function
    of doc_ord, so batches slice the ordinal space, and each batch
    tokenizes its slice exactly once)."""
    s0 = b * n_segments // n_batches
    s1 = (b + 1) * n_segments // n_batches
    lo = (s0 * n_docs + n_segments - 1) // n_segments
    hi = n_docs if b == n_batches - 1 else (s1 * n_docs + n_segments - 1) // n_segments
    return lo, hi, s0, s1


def build_index(
    spark: SparkSession,
    df: DataFrame,
    index_dir: str,
    *,
    n_buckets: int = 64,
    n_segments: int | None = None,
    n_batches: int = 1,
    with_positions: bool = False,
    resume: bool = True,
    publish: bool = True,
) -> BuildResult:
    """Build (or resume) an index version over a transcript DataFrame
    (conv_id, turn_idx, role, text, tool, ts) and atomically publish it."""
    docs = assign_doc_ordinals(with_doc_ids(df))
    n_docs = docs.count()
    if n_segments is None:
        # ~4M docs per segment at scale; always >=1. Segments are both the
        # skew-salt ranges and the resume/lineage partitions.
        n_segments = max(1, min(65536, -(-n_docs // 4_000_000)))
    n_segments = max(n_segments, n_batches)
    params = {
        "n_buckets": n_buckets,
        "n_segments": n_segments,
        "n_batches": n_batches,
        "with_positions": with_positions,
        "n_docs": n_docs,
        "analyzer": "standard_lowercase_v1",
    }

    vdir = catalog.unpublished_version_dir(index_dir, params) if resume else None
    if vdir is None:
        vdir = catalog.new_version_dir(index_dir)
        catalog.write_json(os.path.join(vdir, "build_params.json"), params)
    ckpt_dir = os.path.join(vdir, "checkpoints")

    # ---- stage 1: doc_stats (stored fields + norms) -----------------------
    doc_stats_path = os.path.join(vdir, "doc_stats")
    ds_ckpt = os.path.join(ckpt_dir, "doc_stats.json")
    sc = spark.sparkContext
    n_parts = max(sc.defaultParallelism, min(n_segments, 1024))
    if not (resume and os.path.exists(ds_ckpt)):
        from ..analysis import doc_length_udf

        t0 = time.time()
        (
            docs.withColumn("dl", doc_length_udf("text"))
            .withColumn(
                "seg",
                F.least(
                    (F.col("doc_ord") * n_segments / n_docs).cast("long"),
                    F.lit(n_segments - 1),
                ).cast("int"),
            )
            .select(
                "doc_ord", "doc_id", "conv_id", "turn_idx", "role", "tool",
                "ts", "dl", "seg", "text",
            )
            .repartitionByRange(n_parts, "doc_ord")
            .sortWithinPartitions("doc_ord")
            .write.mode("overwrite")
            .parquet(doc_stats_path)
        )
        stats = (
            spark.read.parquet(doc_stats_path)
            .agg(
                F.count("*").alias("n"),
                F.sum("dl").alias("total_tokens"),
                F.avg("dl").alias("avgdl"),
            )
            .collect()[0]
        )
        if stats["n"] != n_docs:  # 100% gate (reference uses >=90%)
            raise RuntimeError(f"doc_stats rows {stats['n']} != source rows {n_docs}")
        catalog.write_json(
            ds_ckpt,
            {
                "n_docs": n_docs,
                "total_tokens": int(stats["total_tokens"] or 0),
                "avgdl": float(stats["avgdl"] or 0.0),
                "wall_s": round(time.time() - t0, 3),
            },
        )
    parent = getattr(docs, "_persisted_parent", None)
    if parent is not None:
        parent.unpersist()
    ds_meta = catalog.read_json(ds_ckpt)
    doc_stats = spark.read.parquet(doc_stats_path)

    # ---- stage 2: postings, one idempotent batch at a time ----------------
    postings_root = os.path.join(vdir, "postings")
    result = BuildResult(
        vdir, n_docs, ds_meta["avgdl"], ds_meta["total_tokens"]
    )
    for b in range(n_batches):
        bk = os.path.join(ckpt_dir, f"batch_{b:05d}.json")
        if resume and os.path.exists(bk):
            result.batches_skipped += 1
            continue
        t0 = time.time()
        lo, hi, s0, s1 = _doc_range_for_batch(b, n_batches, n_segments, n_docs)
        slice_df = doc_stats.filter(
            (F.col("doc_ord") >= lo) & (F.col("doc_ord") < hi)
        )
        flat = _tokenize_flat(slice_df, n_docs, n_segments, n_buckets, with_positions)
        enc = (
            flat.repartition(n_parts, "tbucket", "seg")
            .sortWithinPartitions("term", "seg", "doc_ord")
            .mapInPandas(
                lambda it: (encode_chunks(pdf, with_positions) for pdf in it),
                ENC_SCHEMA,
            )
        )
        batch_path = os.path.join(postings_root, f"batch={b}")
        enc.write.mode("overwrite").partitionBy("tbucket").parquet(batch_path)

        # lineage + metrics per segment, from the data actually written
        written = spark.read.parquet(batch_path)
        seg_rows = (
            written.groupBy("seg")
            .agg(
                F.count("*").alias("chunks"),
                F.sum("df_chunk").alias("postings"),
                F.sum(F.length("doc_bytes") + F.length("tf_bytes")).alias("bytes"),
            )
            .collect()
        )
        turns = slice_df.count()
        segs = {
            str(r["seg"]): {
                "chunks": r["chunks"],
                "postings": int(r["postings"]),
                "bytes_compressed": int(r["bytes"]),
            }
            for r in seg_rows
        }
        catalog.write_json(
            bk,
            {
                "batch": b,
                "doc_ord_range": [lo, hi],
                "seg_range": [s0, s1],
                "turns_tokenized": turns,
                "postings_emitted": int(sum(s["postings"] for s in segs.values())),
                "bytes_compressed": int(sum(s["bytes_compressed"] for s in segs.values())),
                "segments": segs,
                "wall_s": round(time.time() - t0, 3),
            },
        )
        result.batches_run += 1

    # ---- stage 3: term dictionary -----------------------------------------
    ts_ckpt = os.path.join(ckpt_dir, "term_stats.json")
    term_stats_path = os.path.join(vdir, "term_stats")
    if not (resume and os.path.exists(ts_ckpt)):
        postings = spark.read.parquet(postings_root)
        (
            postings.groupBy("term")
            .agg(
                F.sum("df_chunk").alias("df"),
                F.sum("sum_tf").alias("total_tf"),
                F.count("*").alias("n_chunks"),
                F.max(F.array_max("block_max_tf")).alias("max_tf"),
            )
            .withColumn(
                "tbucket",
                F.udf(lambda t: term_bucket(t, n_buckets), T.IntegerType())("term"),
            )
            .repartitionByRange(max(1, n_buckets // 16), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(term_stats_path)
        )
        n_terms = spark.read.parquet(term_stats_path).count()
        catalog.write_json(ts_ckpt, {"n_terms": n_terms})

    # ---- manifest + atomic publish ----------------------------------------
    manifest = dict(params)
    manifest.update(
        {
            "avgdl": ds_meta["avgdl"],
            "total_tokens": ds_meta["total_tokens"],
            "n_terms": catalog.read_json(ts_ckpt)["n_terms"],
            "k1": 1.2,
            "b": 0.75,
        }
    )
    catalog.write_json(os.path.join(vdir, "manifest.json"), manifest)
    if publish:
        catalog.publish_version(index_dir, vdir)
    result.metrics = manifest
    return result
