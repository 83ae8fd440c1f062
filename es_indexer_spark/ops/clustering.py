"""Duplicate-cluster resolution: connected components over a near-dup
pair list, plus keep-first canonicalization — the step between "find dup
pairs" (``ops/dedup.py``) and "emit a deduplicated corpus".

The reference stops at single-doc replace (its ES ``_id`` upsert,
``IndexerMetadataServiceImpl.java:429-435``); a training-data pipeline
additionally needs transitive closure over the pair graph so A~B, B~C
collapse to ONE retained document, not two independent pairs.

Algorithm: iterative min-label propagation over the symmetric edge list
— each round a HOP (every node adopts the minimum label among itself
and its neighbours; the DataFrame rendering of HashToMin, Rastogi et
al., "Finding Connected Components in MapReduce", ICDE'13) followed by
a JUMP (pointer doubling: ``label ← label(label)``, one self-join of
the O(V) label table). The hop alone converges in O(diameter) rounds —
fine for near-dup graphs (unions of near-cliques, diameter 2-3) but
pathological on chain-shaped components; the jump halves the remaining
distance each round, so convergence is O(log diameter) — a 10^4-node
chain closes in ~15 rounds, not 10^4 (pytest-pinned).

Per round: one edge⋈label shuffle join + one label⋈label self-join —
no driver state, no collect; convergence is probed with ``isEmpty`` (a
short-circuiting take(1), not a full count). ``localCheckpoint``
truncates lineage each round so plans stay flat however many rounds
run. The labels table carries two longs per node — at 10^12 edges the
joins are plain hash-partitioned shuffles; the only cross-round state
is that table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import sql_ngram_jaccard_pairs


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve (id_a, id_b) duplicate pairs into components.

    Returns (id, cluster_id) for every id appearing in ``pairs``, where
    cluster_id = min id reachable in the undirected pair graph (the
    keep-first canonical representative)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint(eager=True)
    n_rounds = 0
    for _ in range(max_iter):
        n_rounds += 1
        # HOP: adopt the minimum label among self and neighbours
        nbr_min = (
            edges.join(
                labels.select(F.col("id").alias("dst"), F.col("label").alias("nl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nbr_label"))
            .select(F.col("src").alias("id"), "nbr_label")
        )
        hopped = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            # materialized before the self-join below: both sides of the
            # JUMP reference this frame, and without the checkpoint the
            # O(E) edge-join HOP would execute twice per round
            .localCheckpoint(eager=True)
        )
        # JUMP (pointer doubling): label ← min(label, label(label)) — every
        # label is itself a node id present in the table, so one self-join
        # halves the remaining propagation distance
        new_labels = (
            hopped.join(
                hopped.select(F.col("id").alias("_jid"), F.col("label").alias("_jl")),
                F.col("label") == F.col("_jid"),
                "left",
            )
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("_jl", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)  # cut lineage per round
        )
        converged = (
            new_labels.select("id", F.col("label").alias("new_label"))
            .join(labels, "id")
            .filter(F.col("new_label") != F.col("label"))
            .isEmpty()  # take(1) short-circuit, not a full count
        )
        labels = new_labels
        if converged:
            break
    out = labels.select("id", F.col("label").alias("cluster_id"))
    # best-effort telemetry for tests: a plain attribute, lost on any
    # further transformation — not API
    out._n_rounds = n_rounds
    return out


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Every doc with its duplicate-cluster id (singletons = own id)."""
    comp = connected_components(pairs)
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(comp.withColumnRenamed("cluster_id", "_cc"), "id", "left")
        .select("id", F.coalesce("_cc", "id").alias("cluster_id"))
    )


def dedup_retained(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep-first dedup: the ids that SURVIVE collapsing each duplicate
    cluster to its minimum-id representative."""
    cl = dup_clusters(docs, pairs, id_col)
    return cl.filter(F.col("id") == F.col("cluster_id")).select("id")


# ---- SQL mirrors (DuckDB) ---------------------------------------------------
# Transitive closure as a recursive CTE: reach(id, r) holds every (node,
# reachable-node) pair; min(r) per node is the component representative.
# Exact on the small oracle scale; the Spark path above is the one that
# runs at corpus scale.


def _sql_components(pairs_sql: str) -> str:
    return f"""
p as materialized (
  select id_a, id_b from ({pairs_sql})
),
edges as (
  select id_a as src, id_b as dst from p
  union
  select id_b as src, id_a as dst from p
),
reach(id, r) as (
  select src, src from edges
  union
  select e.src, reach.r from edges e join reach on reach.id = e.dst
),
comp as (select id, min(r) as cluster_id from reach group by id)
"""


def sql_dup_clusters(pairs_sql: str, table: str = "documents") -> str:
    return f"""
with recursive {_sql_components(pairs_sql)}
select d.doc_id as id, coalesce(c.cluster_id, d.doc_id) as cluster_id
from {table} d left join comp c on d.doc_id = c.id
"""


def sql_dedup_retained(pairs_sql: str, table: str = "documents") -> str:
    return f"""
with recursive {_sql_components(pairs_sql)}
select d.doc_id as id
from {table} d left join comp c on d.doc_id = c.id
where coalesce(c.cluster_id, d.doc_id) = d.doc_id
"""


def sql_jaccard_pairs_inner(
    table: str = "documents",
    threshold: float = 0.5,
    max_df: int | None = 100,
) -> str:
    """The exact-Jaccard pair list as an embeddable subquery (the same
    statement the tp_jaccard_pairs oracle runs)."""
    return sql_ngram_jaccard_pairs(table=table, threshold=threshold, max_df=max_df)
