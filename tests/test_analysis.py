"""Golden analyzer tests — mirrors the reference's analyzer golden tests
(``IndexerServiceIT.verifyAbstractPhrases`` / ``verifyTokenGeneratedMaxLimit``)."""

import pandas as pd

from es_indexer_spark.analysis import (
    ENGLISH_STOP,
    MAX_TOKENS,
    SynonymSet,
    analyze,
    build_acronym_rules,
    suggest_tokens_series,
    term_freqs_batch,
    tokenize_py,
    tokenize_series,
)


def test_index_tokenizer_basic():
    assert tokenize_py("Quick Brown-Fox jumps!") == ["quick", "brown", "fox", "jumps"]
    assert tokenize_py("a_b c.d") == ["a", "b", "c", "d"]  # underscore breaks
    assert tokenize_py("CO2 levels 42") == ["co2", "levels", "42"]
    assert tokenize_py("") == []
    assert tokenize_py(None) == []


def test_index_tokenizer_unicode():
    # standard tokenizer keeps unicode letters; index analyzer does NOT fold
    assert tokenize_py("Café au lait") == ["café", "au", "lait"]


def test_tokenize_series_matches_py():
    texts = ["Hello World", "", None, "one-two three"]
    got = tokenize_series(pd.Series(texts)).tolist()
    assert got == [tokenize_py(t) for t in texts]


def test_suggest_chain_stages():
    # html_strip, lowercase, asciifold, numbers, uuid, non-standard, et al,
    # english stop, min length — each exercised
    s = pd.Series(
        [
            "<b>Café</b> 42 study, 123e4567-e89b-12d3-a456-426614174000 "
            "et al. the quick brown fox x"
        ]
    )
    toks = suggest_tokens_series(s).iloc[0]
    unigrams = [t for t in toks if " " not in t]
    assert unigrams == ["cafe", "study", "quick", "brown", "fox"]
    assert "quick brown" in toks
    assert "quick brown fox" in toks
    # no stop words, no 1-char, no numbers survive
    assert not set(unigrams) & ENGLISH_STOP
    assert all(len(t) >= 2 for t in unigrams)


def test_suggest_shingle_expansion():
    toks = suggest_tokens_series(pd.Series(["quick brown fox jumps"])).iloc[0]
    expected = {
        "quick", "brown", "fox", "jumps",
        "quick brown", "brown fox", "fox jumps",
        "quick brown fox", "brown fox jumps",
        "quick brown fox jumps",
    }
    assert set(toks) == expected
    assert len(toks) == len(expected)  # unique filter


def test_suggest_token_limit():
    big = " ".join(
        "tok" + "".join("abcdefghij"[int(c)] for c in str(i)) for i in range(1000)
    )
    toks = suggest_tokens_series(pd.Series([big])).iloc[0]
    unigrams = [t for t in toks if " " not in t]
    assert len(unigrams) == MAX_TOKENS


def test_analyze_endpoint():
    assert analyze("The Quick Fox", "index") == ["the", "quick", "fox"]
    assert analyze("The Quick Fox", "english_stop") == ["quick", "fox"]


def test_term_freqs_batch():
    g = term_freqs_batch(pd.Series(["a b a c", "b b"]))
    recs = {(int(r.row), r.term): (int(r.tf), int(r.dl)) for r in g.itertuples()}
    assert recs[(0, "a")] == (2, 4)
    assert recs[(0, "b")] == (1, 4)
    assert recs[(0, "c")] == (1, 4)
    assert recs[(1, "b")] == (2, 2)


def test_term_freqs_positions():
    g = term_freqs_batch(pd.Series(["x y x"]), with_positions=True)
    byterm = {r.term: list(r.positions) for r in g.itertuples()}
    assert byterm["x"] == [0, 2]
    assert byterm["y"] == [1]


def test_synonym_expand():
    syn = SynonymSet(["aad => australian antarctic division", "soop => ship of opportunity"])
    groups = syn.expand(["aad", "krill"])
    assert groups[0] == ["aad", "australian", "antarctic", "division"]
    assert groups[1] == ["krill"]
    v0 = syn.version
    syn.replace(["ams => acoustic monitoring system"])
    assert syn.version == v0 + 1
    assert syn.expand(["aad"]) == [["aad"]]


def test_build_acronym_rules():
    rules = build_acronym_rules(
        ["AAD - Australian Antarctic Division", "Somewhere Institute - SI",
         "notanacronym - lowercase thing"],
        manual_rules=["nrmn => national reef monitoring network"],
    )
    assert "aad => australian antarctic division" in rules
    assert "si => somewhere institute" in rules
    assert rules == sorted(set(rules))
    assert not any(r.startswith("notanacronym") for r in rules)


def test_suggest_vectorized_matches_scalar_reference():
    """The vectorized shingle chain must be byte-identical to the scalar
    reference (suggest_tokens_py) — including every fixture oddity."""
    import numpy as np
    from es_indexer_spark.analysis import suggest_tokens_py

    rng = np.random.default_rng(3)
    oddities = [
        "", "   ", "the and of to is", "42 2024 7", "café naïve déjà vu",
        "et al. et-al", "<b>bold</b> <i>x</i> plain",
        "123e4567-e89b-12d3-a456-426614174000 uuid text",
        "İstanbul CAFÉ ẞß Maße", "日本語 mixed ascii", "a b c d e f g h",
        "x " * 500,  # token_limit
        "one", "tw o2 three3 four", "under_score-dash",
    ]
    # plus pseudo-random zipfy sentences
    vocab = ["baco", "cora", "dala", "the", "merge", "spark", "42", "café", "xx"]
    for _ in range(60):
        k = rng.integers(0, 30)
        oddities.append(" ".join(rng.choice(vocab, size=k)))
    s = pd.Series(oddities)
    got = suggest_tokens_series(s)
    for i, text in enumerate(oddities):
        assert got.iloc[i] == suggest_tokens_py(text), repr(text)


def test_suggest_vectorized_matches_scalar_on_testdata():
    import duckdb
    from es_indexer_spark.analysis import suggest_tokens_py

    texts = duckdb.sql(
        "select text from parquet_scan('/root/testdata/sf0.001/documents.parquet')"
    ).df()["text"]
    got = suggest_tokens_series(texts)
    for i in range(len(texts)):
        assert got.iloc[i] == suggest_tokens_py(texts.iloc[i]), i


def test_tokenize_codes_matches_tokenize_series():
    import numpy as np

    from es_indexer_spark.analysis import doc_lengths, tokenize_codes, tokenize_series

    s = pd.Series(
        [
            "  héllo wörld_9 foo--bar ",
            "",
            None,
            "...",
            "a",
            "日本語 テスト 123x",
            "The THE the tokenizer LOWERCASES first",
        ]
    )
    codes, uniq, lens = tokenize_codes(s)
    lists = tokenize_series(s)
    assert list(lens) == [int(len(t)) for t in lists]
    # code stream reconstructs the exact token stream
    flat = [t for toks in lists for t in toks]
    assert list(uniq[codes]) == flat
    # dl kernel agrees with both
    assert list(doc_lengths(s)) == list(lens)
    # distinct terms appear exactly once in the dictionary
    assert len(set(uniq)) == len(uniq)


def test_tokenize_codes_empty_and_all_punct():
    from es_indexer_spark.analysis import tokenize_codes

    codes, uniq, lens = tokenize_codes(pd.Series(["...", "——", ""]))
    assert len(codes) == 0 and len(uniq) == 0 and list(lens) == [0, 0, 0]
