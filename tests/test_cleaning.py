"""Corpus-cleaning operators: PII scrubbing, repetition metrics,
benchmark decontamination. Each has a DuckDB oracle entry in
__spark_entry__.py; here we pin the semantics on constructed inputs and
run a local Spark↔DuckDB parity check at sf0.001 (the driver re-checks
at sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from es_indexer_spark.ops import cleaning, sampling

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_pii_scrub_replaces_and_counts(spark):
    docs = _docs(
        spark,
        [
            ("a", "mail me at bob.smith+x@corp.example.com or call +61412345678"),
            ("b", "server 192.168.1.10 and 10.0.0.1 are up"),
            ("c", "nothing sensitive here"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in cleaning.pii_scrub(docs).collect()}
    assert got["a"]["n_emails"] == 1 and got["a"]["n_phones"] == 1
    assert got["a"]["scrubbed"] == "mail me at <EMAIL> or call <PHONE>"
    assert got["b"]["n_ips"] == 2
    assert got["b"]["scrubbed"] == "server <IP> and <IP> are up"
    assert got["c"]["scrubbed"] == "nothing sensitive here"
    assert got["c"]["n_emails"] == got["c"]["n_ips"] == got["c"]["n_phones"] == 0


def test_pii_injection_fires_on_every_row(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "text", cleaning.inject_pii_col()
    )
    out = cleaning.pii_scrub(docs)
    n = out.count()
    assert (
        out.filter(
            (F.col("n_emails") >= 1) & (F.col("n_ips") >= 1) & (F.col("n_phones") >= 1)
        ).count()
        == n
    )
    # nothing PII-shaped survives the scrub
    leftovers = out.filter(
        F.col("scrubbed").rlike(cleaning.PII_PATTERNS[0][1])
        | F.col("scrubbed").rlike(cleaning.PII_PATTERNS[2][1])
    )
    assert leftovers.count() == 0


def test_repetition_stats_known_values(spark):
    docs = _docs(
        spark,
        [
            # tokens: a a a b -> rep = 1 - 2/4; bigrams: "a a","a a","a b" -> 2/3
            ("a", "a a a b"),
            # two identical lines of three -> dup_line_ratio = 1 - 2/3
            ("b", "hello world\nhello world\nbye"),
            ("c", ""),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in cleaning.repetition_stats(docs).collect()}
    assert got["a"]["n_tokens"] == 4
    assert got["a"]["token_rep_ratio"] == 0.5
    assert got["a"]["max_bigram_ratio"] == round(2 / 3, 6)
    assert got["b"]["dup_line_ratio"] == round(1 - 2 / 3, 6)
    assert got["c"]["n_tokens"] == 0 and got["c"]["dup_line_ratio"] == 0.0


def test_decontaminate_flags_benchmark_overlap(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = _docs(
        spark,
        [
            ("train1", f"prefix words {shared} suffix words"),
            ("train2", "totally unrelated content with many different tokens here"),
            ("bench1", shared),
        ],
    )
    bench = docs.filter(F.col("doc_id") == "bench1")
    got = {r["doc_id"]: r["n_shared_ngrams"] for r in
           cleaning.decontaminate(docs, bench, n=8).collect()}
    assert "train1" in got and "bench1" in got
    assert "train2" not in got
    # shared block has 9 tokens -> two 8-grams, both present in train1
    assert got["train1"] == 2


def test_curate_composition_semantics(spark):
    """Each stage of the composed recipe does its job on a constructed
    corpus: the exact dup keeps first-id only, the contaminated doc is
    dropped, the low-quality doc is dropped."""
    good = (
        "the quick brown fox jumps over the lazy dog and it was a fine day "
        "for that in the sunny park where the children played games"
    )
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        ("1", good, "en", "src0"),
        ("2", good, "en", "src0"),             # exact dup of 1 -> dropped
        ("3", f"{good} {bench_text}", "en", "src0"),  # contaminated -> dropped
        ("4", "x y z", "en", "src0"),          # low quality -> dropped
        ("5", good + " extra tail words here today", "en", "src0"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id string, text string, lang string, source string"
    )
    bench = spark.createDataFrame(
        [("b", bench_text, "en", "src0")],
        "doc_id string, text string, lang string, source string",
    )
    kept = {
        r["doc_id"]: r.asDict()
        for r in cleaning.curate(
            docs, bench, quality_min=0.3, sample_rate=1.0
        ).collect()
    }
    assert "2" not in kept          # dup loses to min-id
    assert "3" not in kept          # shares 8-grams with the benchmark
    assert "4" not in kept          # below the quality floor
    assert "1" in kept and "5" in kept
    assert kept["1"]["quality_score"] >= 0.3 and kept["1"]["n_tokens"] > 10


@pytest.mark.parametrize(
    "entry_key",
    ["tp_pii_scrub", "tp_repetition", "tp_decontaminate", "tp_curation"],
)
def test_cleaning_oracle_parity_sf0001(spark, entry_key):
    """The same Spark-vs-DuckDB comparison the driver runs at sf0.01,
    locally at sf0.001."""
    import __spark_entry__ as e

    spark_df = e.queries()[entry_key](spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{SF}/documents.parquet')"
    )
    oracle_df = con.execute(e.oracle_sql()[entry_key]).df()
    assert len(spark_df) == len(oracle_df), (len(spark_df), len(oracle_df))
    cols = sorted(spark_df.columns)
    assert cols == sorted(oracle_df.columns)
    a = spark_df[cols].sort_values(cols).reset_index(drop=True)
    b = oracle_df[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            assert (av.astype(float) - bv.astype(float)).abs().max() < 1e-9, c
        else:
            assert (av.astype(str) == bv.astype(str)).all(), c


def test_decontaminate_benchmark_split_matches_sampling(spark):
    """The entry's benchmark split is the deterministic hash_sample —
    re-running yields the identical benchmark set (re-run stability)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["doc_id"] for r in sampling.hash_sample(docs, 0.1).select("doc_id").collect()}
    b = {r["doc_id"] for r in sampling.hash_sample(docs, 0.1).select("doc_id").collect()}
    assert a == b and 0 < len(a) < docs.count()


def test_repetition_short_docs_read_zero_not_one(spark):
    """<2 tokens means no bigrams: the ratio must be 0.0 (a one-word or
    empty doc is not 'maximally repetitive')."""
    docs = _docs(spark, [("empty", ""), ("one", "hello"), ("two", "a a")])
    got = {r["doc_id"]: r.asDict() for r in cleaning.repetition_stats(docs).collect()}
    assert got["empty"]["max_bigram_ratio"] == 0.0
    assert got["one"]["max_bigram_ratio"] == 0.0
    assert got["two"]["max_bigram_ratio"] == 1.0  # single bigram "a a"


def test_repetition_long_doc_is_not_quadratic(spark):
    """Worst case for the old O(distinct·n) mode: a long doc of (mostly)
    all-distinct tokens. 120k tokens would be ~1.4e10 comparisons under
    the quadratic formulation (minutes); the sorted-run-length scan is one
    in-row sort. Also pins the value against a straight Python count."""
    import time
    from collections import Counter

    n = 120_000
    toks = [f"w{i}" for i in range(n)]
    toks[500:510] = ["rep"] * 10  # one genuinely repeated bigram zone
    text = " ".join(toks)
    bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    expect = round(Counter(bigrams).most_common(1)[0][1] / len(bigrams), 6)

    docs = _docs(spark, [("big", text)])
    t0 = time.perf_counter()
    row = cleaning.repetition_stats(docs).collect()[0]
    wall = time.perf_counter() - t0
    assert row["max_bigram_ratio"] == pytest.approx(expect, abs=1e-9)
    assert wall < 30, f"long-doc repetition_stats took {wall:.1f}s (quadratic?)"


def test_max_run_count_equals_mode_property(spark):
    """Property (hypothesis): the sorted-run-length fold equals the
    multiset mode count for arbitrary token arrays."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from es_indexer_spark.ops.cleaning import _max_run_count

    cases = []

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.sampled_from("abcde"), min_size=0, max_size=30))
    def collect(xs):
        cases.append(list(xs))

    collect()
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pd.DataFrame({"i": range(len(cases)), "arr": cases})
    sdf = spark.createDataFrame(pdf)
    got = {
        r["i"]: r["m"]
        for r in sdf.select("i", _max_run_count(F.col("arr")).alias("m")).collect()
    }
    for i, xs in enumerate(cases):
        want = Counter(xs).most_common(1)[0][1] if xs else 0
        assert got[i] == want, (xs, got[i], want)
