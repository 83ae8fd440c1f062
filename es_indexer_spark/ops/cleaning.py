"""Corpus-cleaning operators for training-data curation: PII scrubbing,
intra-document repetition metrics, and benchmark decontamination.

All three are the shapes a 100 TB pipeline needs:

- ``pii_scrub`` is pure JVM column expressions (regexp_extract_all /
  regexp_replace, whole-stage-codegen'd) — a linear scan, no shuffle,
  pushed next to the parquet read;
- ``repetition_stats`` is likewise per-row column expressions; the
  max-bigram mode is computed as a run-length scan over the SORTED
  bigram array — O(n log n) in the document's token count, so a 100k-
  token web document costs one in-row sort, not the O(n^2)
  distinct-times-all comparison a naive mode would — still no shuffle;
- ``decontaminate`` joins the corpus against a benchmark n-gram set;
  benchmarks are small by definition (10^4-10^6 eval docs vs 10^9+
  training docs), so the n-gram set is broadcast and the operator is one
  map-side semi-join plus a per-doc partial-aggregated count.

Every pattern below stays in the lookaround-free, backref-free regex
subset that Java's engine (Spark) and RE2 (DuckDB) evaluate identically,
so each operator has an exact DuckDB-SQL mirror for the correctness gate.

Reference linkage: the scrub/replace chain mirrors the reference's
token-cleanup passes (uuid_filter / non_standard_pattern_filter /
remove_numbers regex replaces, portal_records_index_schema.json:50-64)
applied to a different vocabulary of patterns; decontamination is the
same anti-join shape as the missing-uuid report
(IndexerReportController.java:43-70) lifted to n-gram granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import sql_shingles, with_shingles
from .sampling import _sql_uniform_hash, _threshold, uniform_hash_col
from .textstats import SQL_TOKENS, tokens_col

# (name, pattern, placeholder) — replacement order is part of the
# contract (mirrored in SQL): emails first so the IP/phone passes never
# see an address's digit runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phones", r"\+\d{9,15}", "<PHONE>"),
]


def pii_scrub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc PII counts (on the original text) + the scrubbed text with
    each match replaced by a typed placeholder."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed: Column = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))


def sql_pii_scrub(table: str = "documents", text: str = "text") -> str:
    counts = ", ".join(
        f"len(regexp_extract_all({text}, '{pat}')) as n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    scrubbed = text
    for _, pat, repl in PII_PATTERNS:
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{repl}', 'g')"
    return f"select doc_id, {counts}, {scrubbed} as scrubbed from {table}"


def inject_pii_col(id_col: str = "doc_id", text_col: str = "text") -> Column:
    """Deterministic PII injection (for exercising the scrubber on a
    corpus that contains none): appends an email, an IPv4 and an E.164
    phone derived from the row itself — identical expression exists in
    SQL (``sql_inject_pii``), no randomness, no external data."""
    return F.concat(
        F.col(text_col),
        F.lit(" contact "),
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 6),
        F.lit("@mail.example.org ip 10."),
        (F.length(F.col(text_col)) % 256).cast("string"),
        F.lit(".0.1 call +614"),
        F.lpad((F.length(F.col(text_col)) % 10000000).cast("string"), 8, "0"),
    )


def sql_inject_pii(key: str = "doc_id", text: str = "text") -> str:
    return (
        f"{text} || ' contact ' || substr(md5({key}::varchar), 1, 6)"
        f" || '@mail.example.org ip 10.' || (length({text}) % 256)::varchar"
        f" || '.0.1 call +614' || lpad((length({text}) % 10000000)::varchar, 8, '0')"
    )


def _bigrams(toks: Column) -> Column:
    # <2 tokens → no bigrams (ratio reads 0.0: a one-word doc is not
    # "maximally repetitive")
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _max_run_count(arr: Column) -> Column:
    """Count of the most frequent element — the mode's multiplicity —
    computed as the longest run in the SORTED array: O(n log n) per row
    (one in-row sort + ONE fold pass) instead of the O(distinct·n) scan
    of comparing every distinct value against the whole array. A single
    ``aggregate`` fold is used (not index-based ``element_at`` over a
    position sequence) because higher-order-function lambdas re-evaluate
    captured subexpressions per element — an indexed formulation silently
    re-sorts the array n times. 0 on an empty array.

    Fold invariant: elements are non-empty tokens, so the '' seed never
    equals a real element and the first element always opens run=1."""
    srt = F.array_sort(arr)
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(acc["prev"] == x, acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(srt, acc0, step)["best"]


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition signals (the Gopher/FineWeb-style quality
    heuristics): token repetition (1 − distinct/total), the most frequent
    bigram's share of all bigrams, and duplicate-line fraction.

    Cost is O(n log n) in the doc's token count (the sorted-run-length
    mode in ``_max_run_count``) — safe on arbitrarily long web documents.
    Docs with <2 tokens have no bigrams and read 0.0, not 1.0.

    The token/bigram arrays are materialized as intermediate projection
    columns on purpose: a higher-order-function lambda re-evaluates any
    captured subexpression PER ELEMENT, so inlining ``tokens_col`` into
    the bigram ``transform`` re-runs the tokenizer n times per row — the
    intermediate attributes keep every stage single-evaluation (and
    Catalyst's CollapseProject leaves multiply-referenced non-cheap
    expressions un-inlined)."""
    toks_df = df.select(
        F.col(id_col),
        tokens_col(text_col).alias("_toks"),
        F.filter(
            F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
            lambda x: x != F.lit(""),
        ).alias("_lines"),
    ).withColumn("_bg", _bigrams(F.col("_toks")))
    n_tok = F.size("_toks")
    token_rep = F.when(
        n_tok > 0, F.lit(1.0) - F.size(F.array_distinct("_toks")) / n_tok
    ).otherwise(F.lit(0.0))
    n_bg = F.size("_bg")
    bigram_ratio = F.when(
        n_bg > 0, _max_run_count(F.col("_bg")) / n_bg
    ).otherwise(F.lit(0.0))
    n_lines = F.size("_lines")
    dup_lines = F.when(
        n_lines > 0, F.lit(1.0) - F.size(F.array_distinct("_lines")) / n_lines
    ).otherwise(F.lit(0.0))
    return toks_df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(token_rep, 6).alias("token_rep_ratio"),
        F.round(bigram_ratio, 6).alias("max_bigram_ratio"),
        F.round(dup_lines, 6).alias("dup_line_ratio"),
    )


def sql_repetition_stats(table: str = "documents", text: str = "text") -> str:
    # The oracle states the mode count directly (max over distinct of
    # per-value count) — quadratic, but it only ever runs at oracle scale;
    # the Spark side's sorted-run-length formulation is provably the same
    # quantity. <2 tokens → empty bigram list → ratio 0.0 on both sides.
    return f"""
with t as (
  select doc_id,
         regexp_extract_all(lower({text}), '[\\p{{L}}\\p{{N}}]+') as toks,
         list_filter(list_transform(string_split({text}, chr(10)), x -> trim(x)),
                     x -> x != '') as lines
  from {table}
), b as (
  select doc_id, toks, lines,
         case when len(toks) >= 2 then
           list_transform(range(1, len(toks)),
                          i -> array_to_string(list_slice(toks, i, i + 1), ' '))
         else []::varchar[] end as bg
  from t
)
select doc_id,
       len(toks) as n_tokens,
       round(case when len(toks) > 0
             then 1.0 - len(list_distinct(toks)) / len(toks)
             else 0.0 end, 6) as token_rep_ratio,
       round(case when len(bg) > 0
             then list_max(list_transform(list_distinct(bg),
                    x -> len(list_filter(bg, y -> y = x)))) / len(bg)
             else 0.0 end, 6) as max_bigram_ratio,
       round(case when len(lines) > 0
             then 1.0 - len(list_distinct(lines)) / len(lines)
             else 0.0 end, 6) as dup_line_ratio
from b
"""


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training docs sharing any token ``n``-gram with a benchmark
    set (train/eval decontamination). Returns (doc_id, n_shared_ngrams)
    for contaminated docs only; anti-join the result against the corpus
    to get the clean retained set.

    The benchmark n-gram set is broadcast (eval suites are orders of
    magnitude smaller than the training corpus), so the expensive side is
    one map-local hash probe over the exploded corpus n-grams followed by
    a partial-aggregated per-doc count — no corpus-sized shuffle. Docs
    shorter than ``n`` tokens fall back to their whole token stream as a
    single gram (same convention as the Jaccard shingles, mirrored in
    ``sql_shingles``)."""
    bench_grams = (
        with_shingles(benchmark, n)
        .select(F.explode(F.array_distinct(F.col("_sh"))).alias("s"))
        .distinct()
    )
    doc_grams = with_shingles(docs, n).select(
        F.col(id_col), F.explode(F.array_distinct(F.col("_sh"))).alias("s")
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "s")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_shared_ngrams"))
    )


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    quality_min: float = 0.65,
    sample_rate: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """The end-to-end curation recipe as ONE declarative DataFrame
    program: exact-dedup keep-first → benchmark decontamination →
    quality floor → deterministic hash sample. Catalyst plans the whole
    chain together: ONE corpus-sized shuffle total (the keep-first
    window over the content fingerprint), a benchmark-bounded anti-join,
    and pure projections/filters that fuse into the surrounding stages.
    Output: (doc_id, lang, source, n_tokens, quality_score) — the
    retained training set with its quality stats."""
    from pyspark.sql import Window

    from .textstats import quality_features, tokens_col

    # keep-first via ONE window over the content fingerprint (one corpus
    # shuffle, vs groupBy + join-back which would cost two at 10^9 docs);
    # row_number ordered by id keeps the min-id member of each dup group,
    # identical to the oracle's min(doc_id) formulation
    rn = F.row_number().over(
        Window.partitionBy("_fp").orderBy(id_col)
    )
    kept = (
        docs.withColumn("_fp", F.md5(F.concat_ws(" ", tokens_col("text"))))
        .withColumn("_rn", rn)
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )
    # contamination set is benchmark-bounded → broadcast-able anti-join;
    # quality features and the sample are pure projections/filters that
    # fuse into the post-shuffle stage
    cont = decontaminate(docs, benchmark, n=n, id_col=id_col).select(id_col)
    q = quality_features(
        kept.join(cont, id_col, "left_anti"),
        id_col=id_col,
        extra_cols=("lang", "source"),
    )
    return (
        q.filter(F.col("quality_score") >= quality_min)
        .filter(uniform_hash_col(F.col(id_col)) < F.lit(_threshold(sample_rate)))
        .select(id_col, "lang", "source", "n_tokens", "quality_score")
    )


def sql_curate(
    benchmark_rate: float,
    n: int = 8,
    quality_min: float = 0.65,
    sample_rate: float = 0.5,
    table: str = "documents",
) -> str:
    from .textstats import sql_content_fingerprint, sql_quality_features

    return f"""
with fp as ({sql_content_fingerprint(table)}),
keep as (select min(doc_id) as doc_id from fp group by fingerprint),
cont as (select distinct doc_id
         from ({sql_decontaminate(benchmark_rate, n, table)})),
q as (select * from ({sql_quality_features(table)}))
select d.doc_id, d.lang, d.source, q.n_tokens, q.quality_score
from {table} d
join keep using (doc_id)
join q on q.doc_id = d.doc_id
where d.doc_id not in (select doc_id from cont)
  and q.quality_score >= {quality_min}
  and {_sql_uniform_hash('d.doc_id')} < {_threshold(sample_rate)}
"""


def sql_decontaminate(
    benchmark_rate: float,
    n: int = 8,
    table: str = "documents",
    key: str = "doc_id",
) -> str:
    """Mirror of ``decontaminate`` where the benchmark is the same
    deterministic ``hash_sample(benchmark_rate)`` split of ``table`` the
    Spark entry uses (md5-threshold parity proven by the sampling
    oracles)."""
    return f"""
with bench as (
  select * from {table}
  where {_sql_uniform_hash(key)} < {_threshold(benchmark_rate)}
), bg as (
  select distinct unnest(list_distinct({sql_shingles(n)})) as s from bench
), dg as (
  select doc_id, unnest(list_distinct({sql_shingles(n)})) as s from {table}
)
select dg.doc_id, count(*) as n_shared_ngrams
from dg join bg using (s)
group by 1
"""
