"""Round-3 training-pipeline operators: duplicate-cluster resolution
(connected components), deterministic sampling / domain mixing, and
sequence packing. Each operator also has a DuckDB oracle entry in
__spark_entry__.py; these tests cover the semantics the oracle can't
state (transitivity, determinism across partitionings, nesting, the
distributed-prefix-sum equivalence to a global window)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_indexer_spark.ops import clustering, packing, sampling


# ---------------------------------------------------------------- clustering


def test_connected_components_transitive(spark):
    # two chains and a singleton pair: {1,2,3,4} via 1-2,2-3,3-4; {10,11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in clustering.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    # a 12-node path needs several propagation rounds (diameter 11)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    got = clustering.connected_components(pairs)
    assert got.select("cluster_id").distinct().collect()[0][0] == 0
    assert got.count() == 13


def test_connected_components_10k_chain_logarithmic_rounds(spark):
    """A 10^4-node chain is the worst case for pure hop propagation
    (diameter 10^4 would blow any sane round budget); pointer doubling
    must close it in O(log diameter) rounds. Pins both the answer (one
    component labeled 0) and the round count."""
    n = 10_000
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    got = clustering.connected_components(pairs, max_iter=40)
    labels = got.select("cluster_id").distinct().collect()
    assert [r[0] for r in labels] == [0]
    assert got.count() == n
    assert got._n_rounds <= 20, f"took {got._n_rounds} rounds (no doubling?)"


def test_dup_clusters_covers_singletons(spark):
    docs = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([(1, 5), (5, 7)], "id_a long, id_b long")
    cl = clustering.dup_clusters(docs, pairs)
    got = {r["id"]: r["cluster_id"] for r in cl.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 1, 6: 6, 7: 1}
    kept = {r["id"] for r in clustering.dedup_retained(docs, pairs).collect()}
    assert kept == {0, 1, 2, 3, 4, 6}


# ------------------------------------------------------------------ sampling


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.range(0, 2000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("word "), F.col("id").cast("string")).alias("text"),
            F.element_at(
                F.array(F.lit("en"), F.lit("es"), F.lit("fr"), F.lit("de")),
                (F.col("id") % 4 + 1).cast("int"),
            ).alias("lang"),
            F.concat(F.lit("src"), (F.col("id") % 5).cast("string")).alias("source"),
        )
        .persist()
    )


def test_hash_sample_deterministic_and_nested(docs):
    s1 = {r["doc_id"] for r in sampling.hash_sample(docs, 0.3).collect()}
    s2 = {
        r["doc_id"]
        for r in sampling.hash_sample(docs.repartition(7), 0.3).collect()
    }
    assert s1 == s2  # partitioning-independent
    small = {r["doc_id"] for r in sampling.hash_sample(docs, 0.1).collect()}
    assert small <= s1  # thresholds nest: raising the rate only adds rows
    assert 0.2 < len(s1) / 2000 < 0.4


def test_stratified_sample_rates(docs):
    out = sampling.stratified_sample(docs, {"en": 1.0, "es": 0.5}, stratum="lang")
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(per) == {"en", "es"}  # unlisted strata dropped
    assert per["en"] == 500  # rate 1.0 keeps everything
    assert 150 < per["es"] < 350


def test_domain_mix_hits_target_weights(docs):
    out = sampling.domain_mix(
        docs, {"src0": 0.5, "src1": 0.25, "src2": 0.25}, domain="source"
    )
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # src0 is the binding domain (highest weight, equal counts): kept 100%
    assert per["src0"] == 400
    # others downsample to ~half of src0's share
    assert 140 < per["src1"] < 260 and 140 < per["src2"] < 260
    assert set(per) == {"src0", "src1", "src2"}


def test_sample_is_pure_filter(docs):
    plan = sampling.hash_sample(docs, 0.2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: sampling pushes to the scan


# ------------------------------------------------------------------- packing


def test_pack_sequences_matches_global_window(spark, docs):
    got = packing.pack_sequences(docs, budget=64).collect()
    assert len(got) == 2000
    cum = 0
    for r in sorted(got, key=lambda r: r["id"]):
        assert r["pack_id"] == cum // 64
        cum += r["n_tokens"]


def test_pack_sequences_no_single_partition_window(spark, docs):
    plan = (
        packing.pack_sequences(docs, budget=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan  # the scale hazard this operator avoids


def test_pack_stats_budget_property(spark, docs):
    budget = 64
    packed = packing.pack_sequences(docs, budget=budget)
    stats = packing.pack_stats(packed).orderBy("pack_id").collect()
    # stream-coverage invariant: the first doc of pack p starts at the
    # cumulative token total of all earlier packs, and lands in p by
    # definition — so cumsum through pack i >= budget * (next pack id)
    cum = 0
    for cur, nxt in zip(stats, stats[1:]):
        cum += cur["n_tokens"]
        assert cum >= budget * nxt["pack_id"]
        assert cum < budget * (nxt["pack_id"] + 1)
    total = sum(r["n_tokens"] for r in stats)
    assert total == packed.agg(F.sum("n_tokens")).collect()[0][0]


def test_pack_sequences_rejects_bad_budget(docs):
    with pytest.raises(ValueError):
        packing.pack_sequences(docs, budget=0)


# --------------------------------------------------- cross-engine hash parity


def test_md5_hash_parity_with_duckdb(spark):
    import duckdb

    df = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", sampling.uniform_hash_col(F.col("doc_id")).alias("h")
        ).collect()
    }
    want = dict(
        duckdb.sql(
            "select i, ('0x' || substr(md5(i::varchar), 1, 8))::bigint "
            "from range(50) t(i)"
        ).fetchall()
    )
    assert got == want


# -------------------------------------------------------------- conversations


def test_render_conversations_orders_turns(spark):
    from es_indexer_spark.ops import conversations

    rows = [
        ("c1", 2, "assistant", "third", None, "2024-01-01 00:02:00"),
        ("c1", 0, "user", "first", None, "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", "second", None, "2024-01-01 00:01:00"),
        ("c2", 0, "user", "solo", None, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["conv_id"]: r.asDict()
        for r in conversations.render_conversations(df).collect()
    }
    assert got["c1"]["rendered"] == "user: first\nassistant: second\nassistant: third"
    assert got["c1"]["n_turns"] == 3 and got["c1"]["total_tokens"] == 3
    assert got["c2"]["rendered"] == "user: solo"


def test_context_windows_positional_with_gapped_turn_idx(spark):
    """Turn numbering with gaps: the window is the last-k turns BY ORDER
    (positions), and the emitted turn_idx is the original index."""
    from es_indexer_spark.ops import conversations

    rows = [
        ("c1", 10, "user", "a", None, "2024-01-01 00:00:00"),
        ("c1", 20, "user", "b", None, "2024-01-01 00:01:00"),
        ("c1", 40, "assistant", "c", None, "2024-01-01 00:02:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = conversations.context_windows(df, max_context=2).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["turn_idx"] == 40  # original index, not array position
    assert r["prompt"] == "user: a\nuser: b"
    assert r["target"] == "c"
