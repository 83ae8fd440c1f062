"""Corpus generator + doc ordinal tests."""

from pyspark.sql import functions as F

from es_indexer_spark.corpus import (
    assign_doc_ordinals,
    documents_as_transcripts,
    synth_transcripts,
    with_doc_ids,
)


def test_synth_deterministic_across_parallelism(spark):
    a = synth_transcripts(spark, n_convs=20, turns_per_conv=5, seed=7, partitions=1)
    b = synth_transcripts(spark, n_convs=20, turns_per_conv=5, seed=7, partitions=4)
    pa = a.orderBy("conv_id", "turn_idx").toPandas()
    pb = b.orderBy("conv_id", "turn_idx").toPandas()
    assert pa.equals(pb)
    assert len(pa) == 100
    assert pa["role"].isin(["user", "assistant", "system", "tool"]).all()
    # tool set only on tool turns
    assert pa.loc[pa.role != "tool", "tool"].isna().all()
    assert pa.loc[pa.role == "tool", "tool"].notna().all()
    # ts strictly increasing within a conv
    g = pa.groupby("conv_id")["ts"].apply(lambda s: s.is_monotonic_increasing)
    assert g.all()


def test_doc_ordinals_dense_and_ordered(spark):
    df = synth_transcripts(spark, n_convs=30, turns_per_conv=4, seed=3)
    out = assign_doc_ordinals(df, num_partitions=5).orderBy("doc_ord").toPandas()
    assert out["doc_ord"].tolist() == list(range(120))
    # ordinal order == (conv_id, turn_idx) order
    resorted = out.sort_values(["conv_id", "turn_idx"])
    assert resorted["doc_ord"].tolist() == list(range(120))


def test_doc_ids(spark):
    df = synth_transcripts(spark, n_convs=2, turns_per_conv=2, seed=1)
    ids = set(r.doc_id for r in with_doc_ids(df).collect())
    assert ids == {"conv00000000:0", "conv00000000:1", "conv00000001:0", "conv00000001:1"}


def test_documents_adapter(spark, sf_dir):
    df = documents_as_transcripts(spark, sf_dir)
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df.count() == 500


def test_ordinal_offsets_broadcast_join_path(spark, monkeypatch):
    """Above ORDINAL_OFFMAP_MAX partitions the offset lookup becomes a
    broadcast join (a 10^5-entry map literal would bloat every task
    plan); forcing the threshold to 0 must yield identical ordinals."""
    from es_indexer_spark import corpus

    df = synth_transcripts(spark, 30, 5, seed=3)
    a = {
        (r["conv_id"], r["turn_idx"]): r["doc_ord"]
        for r in corpus.assign_doc_ordinals(df, num_partitions=4).collect()
    }
    monkeypatch.setattr(corpus, "ORDINAL_OFFMAP_MAX", 0)
    b = {
        (r["conv_id"], r["turn_idx"]): r["doc_ord"]
        for r in corpus.assign_doc_ordinals(df, num_partitions=4).collect()
    }
    assert a == b and len(a) == 150
    assert sorted(a.values()) == list(range(150))
