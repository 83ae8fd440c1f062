"""Text analysis: language-ID, quality scoring, token counting,
fingerprinting — pure Spark column expressions (whole-stage-codegen'd,
JVM-side; no Python in the hot path), each with an exact DuckDB-SQL
mirror used by the driver's correctness gate.

The token regex here is the Java/RE2-portable spelling of the engine's
analyzer (``analysis.TOKEN_RE``): both Spark's regexp_extract_all and
DuckDB evaluate ``[\\p{L}\\p{N}]+`` identically, so value hashes line up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SQL_RE = r"[\p{L}\p{N}]+"

# tiny per-language stopword profiles for the n-gram/stopword-ratio
# language heuristic (deterministic, mirrors in SQL)
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"],
}
EN_STOP_SQL = LANG_PROFILES["en"]


def tokens_col(text_col: str = "text") -> Column:
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_SQL_RE), 0)


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", tokens_col(text_col))


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token count (whitespace+regex tokenizer)."""
    return df.select(F.col(id_col), F.size(tokens_col(text_col)).alias("n_tokens"))


# BPE-ish pre-tokenizer pieces (the GPT-2-style split: contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs) in
# the RE2/Java-regex-portable subset — identical counts in Spark and
# DuckDB (verified). A cheap, library-free estimate of LLM token cost.
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def bpe_token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc BPE-ish piece count (pre-tokenizer granularity — the unit
    an LLM training pipeline budgets by, vs the whitespace/regex word
    count of ``token_counts``)."""
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)).alias(
            "n_pieces"
        ),
    )


def sql_bpe_token_counts(table: str = "documents") -> str:
    pat = BPE_RE.replace("'", "''")
    return (
        f"select doc_id, len(regexp_extract_all(text, '{pat}')) as n_pieces "
        f"from {table}"
    )


def _hits(lang: str) -> Column:
    arr = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
    return F.size(F.array_intersect(F.array_distinct(F.col("tokens")), arr))


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: distinct-stopword hits per language profile,
    deterministic tie-break by profile order (en > es > fr > de)."""
    out = with_tokens(df, text_col)
    for lang in LANG_PROFILES:
        out = out.withColumn(f"hits_{lang}", _hits(lang))
    pred = F.lit("und")
    # reversed so earlier profiles win ties (>= overrides later langs)
    for lang in reversed(list(LANG_PROFILES)):
        cond = F.col(f"hits_{lang}") > 0
        for other in LANG_PROFILES:
            if other == lang:
                continue
            op = (
                F.col(f"hits_{lang}") >= F.col(f"hits_{other}")
                if list(LANG_PROFILES).index(lang) < list(LANG_PROFILES).index(other)
                else F.col(f"hits_{lang}") > F.col(f"hits_{other}")
            )
            cond = cond & op
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return out.select(F.col(id_col), pred.alias("pred_lang"))


def quality_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Length / punctuation / stopword-ratio features + a composite quality
    score in [0,1] — the heuristic-filter stage of a training-data pipeline
    (cf. the reference's completeness ranking, RankingServiceImpl.java:60-169,
    which is the same shape: a weighted sum of when() clauses).
    ``extra_cols`` are passed through unchanged (appended last)."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    alnum_chars = F.length(F.regexp_replace(F.col(text_col), r"[^\p{L}\p{N}]", ""))
    stop_arr = F.array(*[F.lit(w) for w in EN_STOP_SQL])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_tok_len = F.when(n_tok > 0, alnum_chars / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, (n_chars - alnum_chars) / n_chars).otherwise(F.lit(1.0))
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.3
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), 0.3).otherwise(0.0)
        + F.least(stop_ratio * F.lit(3.0), F.lit(1.0)) * 0.2
        + F.when(punct_ratio < 0.5, 0.2).otherwise(0.0)
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality_score"),
        *[F.col(c) for c in extra_cols],
    )


def content_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint: md5 over the space-joined token
    stream — whitespace/case/punctuation-insensitive exact-dup key."""
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", tokens_col(text_col))).alias("fingerprint"),
    )


# ---- SQL mirrors (DuckDB) ---------------------------------------------------

SQL_TOKENS = "regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')"


def sql_token_counts(table: str = "documents") -> str:
    return f"select doc_id, len({SQL_TOKENS}) as n_tokens from {table}"


def sql_language_id(table: str = "documents") -> str:
    hits = {
        lang: (
            f"len(list_intersect(list_distinct({SQL_TOKENS}), "
            f"[{', '.join(repr(w) for w in ws)}]))"
        )
        for lang, ws in LANG_PROFILES.items()
    }
    langs = list(LANG_PROFILES)
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"{hits[lang]} > 0"]
        for j, other in enumerate(langs):
            if i == j:
                continue
            op = ">=" if i < j else ">"
            conds.append(f"{hits[lang]} {op} {hits[other]}")
        cases.append(f"when {' and '.join(conds)} then '{lang}'")
    return (
        f"select doc_id, case {' '.join(cases)} else 'und' end as pred_lang "
        f"from {table}"
    )


def sql_quality_features(table: str = "documents") -> str:
    return f"""
with t as (
  select doc_id, text, {SQL_TOKENS} as toks,
         length(text) as n_chars,
         length(regexp_replace(text, '[^\\p{{L}}\\p{{N}}]', '', 'g')) as alnum
  from {table}
), f as (
  select doc_id,
         len(toks) as n_tokens,
         case when len(toks) > 0 then alnum / len(toks) else 0.0 end as mtl,
         case when len(toks) > 0 then
           len(list_filter(toks, t -> list_contains([{', '.join(repr(w) for w in EN_STOP_SQL)}], t)))::double / len(toks)
         else 0.0 end as sr,
         case when n_chars > 0 then (n_chars - alnum)::double / n_chars else 1.0 end as pr
  from t
)
select doc_id, n_tokens,
       round(mtl, 6) as mean_tok_len,
       round(sr, 6) as stop_ratio,
       round(pr, 6) as punct_ratio,
       round(least(n_tokens / 100.0, 1.0) * 0.3
             + case when mtl >= 3 and mtl <= 10 then 0.3 else 0.0 end
             + least(sr * 3.0, 1.0) * 0.2
             + case when pr < 0.5 then 0.2 else 0.0 end, 6) as quality_score
from f
"""


def sql_content_fingerprint(table: str = "documents") -> str:
    return (
        f"select doc_id, md5(array_to_string({SQL_TOKENS}, ' ')) as fingerprint "
        f"from {table}"
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc mean unigram log-probability under the corpus's own
    unigram distribution — the cheap KenLM-style fluency signal a
    curation pipeline thresholds on (gibberish and boilerplate sit in
    the tails; cf. CCNet/Gopher perplexity filters, here with a unigram
    LM so the score is exactly SQL-mirrorable).

    Plan shape: one explode + per-term count (map-side partial agg), the
    term-probability table joined back BROADCAST (vocabulary-bounded —
    orders of magnitude smaller than the corpus; drop the broadcast hint
    if a pathological vocabulary outgrows executor memory and it becomes
    an ordinary shuffle join), then one groupBy(doc) average — a single
    corpus-sized shuffle total."""
    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
    tf = toks.groupBy("term").agg(F.count("*").alias("n"))
    # the corpus token total rides the lazy plan as a broadcast 1-row
    # cross join, derived from a LIGHT map-side sum of per-doc token
    # counts — deriving it from tf would re-run the heavy explode+groupBy
    # a second time, and an eager .collect() would run it at plan-
    # construction time (review findings, both rounds)
    total = (
        df.select(F.size(tokens_col(text_col)).alias("_n"))
        .agg(F.sum("_n").cast("double").alias("_total"))
    )
    probs = (
        tf.crossJoin(F.broadcast(total))
        .withColumn("logp", F.log(F.col("n") / F.col("_total")))
    )
    return (
        toks.join(F.broadcast(probs.select("term", "logp")), "term")
        .groupBy(id_col)
        .agg(
            F.round(F.avg("logp"), 6).alias("avg_logprob"),
            F.count("*").cast("long").alias("n_tokens"),
        )
    )


def sql_unigram_logprob(table: str = "documents") -> str:
    return f"""
with tok as (
  select doc_id, unnest({SQL_TOKENS}) as term from {table}
), tf as (
  select term, count(*)::double as n from tok group by term
), tot as (select sum(n) as total from tf),
p as (select term, ln(n / total) as logp from tf, tot)
select tok.doc_id,
       round(avg(p.logp), 6) as avg_logprob,
       count(*)::bigint as n_tokens
from tok join p using (term)
group by tok.doc_id
"""
