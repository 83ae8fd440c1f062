"""Deterministic sampling and domain mixing for training-data curation.

A 100 TB pipeline cannot sample with ``rand()``: re-runs must select the
SAME rows (resumability, A/B-able data recipes, auditable lineage — the
same reason the reference's upserts are ``_id``-keyed and replay-safe,
``IndexServiceImpl.java:167-221``). Everything here keys the keep/drop
decision off a content-stable hash of the row key, so sampling is a pure
filter: no shuffle, no state, trivially pushed next to the scan, and
identical on every re-run and at every parallelism.

Hash: the first 8 hex chars of md5(key) as a uniform integer in
[0, 2^32) — chosen because Spark and DuckDB compute it identically
(`conv(substring(md5(k),1,8),16,10)` == `('0x'||substr(md5(k),1,8))::bigint`),
so every operator has an exact SQL oracle. Keep row ⇔ hash < floor(rate·2^32).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

U32 = 1 << 32


def uniform_hash_col(key: Column) -> Column:
    """Deterministic uniform hash of ``key`` in [0, 2^32) (JVM-side)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")


def _sql_uniform_hash(key: str) -> str:
    return f"('0x' || substr(md5({key}::varchar), 1, 8))::bigint"


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return int(math.floor(rate * U32))


def hash_sample(df: DataFrame, rate: float, key: str = "doc_id") -> DataFrame:
    """Uniform deterministic sample: keep ~``rate`` of rows, stable across
    re-runs and partitionings. A pure filter — Catalyst pushes it to the
    scan; no shuffle at any scale."""
    return df.filter(uniform_hash_col(F.col(key)) < F.lit(_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum: str = "lang",
    key: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sample: keep ~``rates[s]`` of stratum
    ``s``; strata absent from ``rates`` are dropped. Still a pure filter
    (the per-stratum threshold is a constant-folded CASE, not a join)."""
    thr: Column = F.lit(0).cast("bigint")
    for s, r in rates.items():
        thr = F.when(F.col(stratum) == s, F.lit(_threshold(r)).cast("bigint")).otherwise(thr)
    return df.filter(uniform_hash_col(F.col(key)) < thr)


def domain_mix(
    df: DataFrame,
    weights: dict[str, float],
    domain: str = "source",
    key: str = "doc_id",
) -> DataFrame:
    """Resample to a target domain mixture with maximum data retention.

    Given target weights w_d, the largest corpus honouring them keeps
    T = min_d(n_d / w_d) weighted units: rate_d = w_d · T / n_d (the
    binding domain keeps 100%, the rest downsample). The per-domain counts
    are ONE tiny aggregate collected to the driver — O(#domains) rows, not
    O(corpus) — then the sample itself is the same pure stratified filter.
    Domains outside ``weights`` are dropped."""
    counts = {
        r[domain]: r["n"]
        for r in df.groupBy(domain).agg(F.count("*").alias("n")).collect()
        if r[domain] in weights
    }
    if not counts:
        return stratified_sample(df, {}, stratum=domain, key=key)
    cap = min(counts[d] / weights[d] for d in counts)
    rates = {d: min(1.0, weights[d] * cap / counts[d]) for d in counts}
    return stratified_sample(df, rates, stratum=domain, key=key)


# ---- SQL mirrors (DuckDB) ---------------------------------------------------


def sql_hash_sample(
    rate: float,
    table: str = "documents",
    key: str = "doc_id",
    cols: str = "doc_id, lang, source",
) -> str:
    return (
        f"select {cols} from {table} "
        f"where {_sql_uniform_hash(key)} < {_threshold(rate)}"
    )


def sql_stratified_sample(
    rates: dict[str, float],
    table: str = "documents",
    stratum: str = "lang",
    key: str = "doc_id",
    cols: str = "doc_id, lang, source",
) -> str:
    cases = " ".join(
        f"when {stratum} = '{s}' then {_threshold(r)}" for s, r in rates.items()
    )
    return (
        f"select {cols} from {table} "
        f"where {_sql_uniform_hash(key)} < (case {cases} else 0 end)"
    )


def sql_domain_mix(
    weights: dict[str, float],
    table: str = "documents",
    domain: str = "source",
    key: str = "doc_id",
    cols: str = "d.doc_id, d.lang, d.source",
) -> str:
    """Mirrors domain_mix: T and the per-domain rates are recomputed in
    SQL from the same counts with the same float64 operations in the same
    order (w·T/n, least with 1.0), so thresholds agree bit-for-bit."""
    values = ", ".join(f"('{d}', {w!r})" for d, w in weights.items())
    return f"""
with w(domain, wt) as (values {values}),
c as (
  select {domain} as domain, count(*)::double as n
  from {table} group by 1
),
t as (select min(c.n / w.wt) as cap from w join c using (domain)),
r as (
  select c.domain,
         least(1.0, w.wt * t.cap / c.n) as rate
  from c join w using (domain) cross join t
)
select {cols}
from {table} d join r on d.{domain} = r.domain
where {_sql_uniform_hash('d.' + key)} < cast(floor(r.rate * 4294967296) as bigint)
"""
