"""Vocabulary enrichment joins — the reference's VocabServiceImpl re-done
as broadcast joins over a flattened tree.

- J1 theme match (``VocabServiceImpl.java:109-168``): record concepts are
  matched against 2nd/3rd-level vocab nodes on lowercased (id, url); the
  2nd-level label is emitted per match.
- J3 organisation match (``VocabServiceImpl.java:197-292``): contact names
  matched case-insensitively against every label variant (displayLabel /
  altLabels / hiddenLabels), nodes with ``replaced_by`` skipped,
  prioritized roles (citation > pointOfContact > any) with first-match
  semantics = ``row_number()`` over the role rank.

The reference walks the tree imperatively with a per-record DFS; here the
tree is flattened ONCE (bounded depth 3, ``vocabs_index_schema.json``) and
both matches are broadcast hash joins — per-record work becomes a probe,
and 10^12 records cost one scan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

VOCAB_NODE = T.StructType(
    [
        T.StructField("label", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("alt_labels", T.ArrayType(T.StringType())),
        T.StructField("hidden_labels", T.ArrayType(T.StringType())),
        T.StructField("replaced_by", T.StringType()),
        T.StructField("level", T.IntegerType()),
        T.StructField("second_level_label", T.StringType()),
        T.StructField("top_level_label", T.StringType()),
    ]
)


def flatten_vocab_tree(spark: SparkSession, roots: list[dict]) -> DataFrame:
    """Flatten a <=3-level vocab tree (ARDC shape,
    ``ArdcVocabServiceImpl.java:171-352``) into one node-per-row frame
    carrying its 2nd/top-level ancestry — built once, broadcast thereafter."""
    rows = []

    def walk(node, level, second, top):
        label = node.get("label")
        second = label if level == 2 else second
        top = label if level == 1 else top
        rows.append(
            (
                label, node.get("id"), node.get("url"),
                node.get("alt_labels", []), node.get("hidden_labels", []),
                node.get("replaced_by"), level, second, top,
            )
        )
        for child in node.get("narrower", []):
            walk(child, level + 1, second, top)

    for r in roots:
        walk(r, 1, None, None)
    return spark.createDataFrame(rows, VOCAB_NODE)


def match_themes(records: DataFrame, vocab: DataFrame) -> DataFrame:
    """J1: (record_id, concepts array<struct<id,url>>) → distinct
    (record_id, theme_label) via broadcast equi-join on lowercased
    (id, url) against 2nd/3rd-level nodes."""
    con = records.select(
        "record_id", F.explode("concepts").alias("c")
    ).select(
        "record_id",
        F.lower(F.col("c.id")).alias("cid"),
        F.lower(F.col("c.url")).alias("curl"),
    )
    dim = F.broadcast(
        vocab.filter(F.col("level").isin(2, 3))
        .select(
            F.lower("id").alias("vid"), F.lower("url").alias("vurl"),
            F.col("second_level_label").alias("theme_label"),
        )
    )
    return (
        con.join(dim, (con["cid"] == dim["vid"]) & (con["curl"] == dim["vurl"]))
        .select("record_id", "theme_label")
        .distinct()
    )


ROLE_RANK = {"citation": 0, "pointOfContact": 1}


def match_organisations(contacts: DataFrame, vocab: DataFrame) -> DataFrame:
    """J3: one best-matching organisation label per record — label-variant
    explode + broadcast join + role-priority row_number."""
    variants = F.broadcast(
        vocab.filter(F.col("replaced_by").isNull())
        .select(
            F.col("label").alias("org_label"),
            F.explode(
                F.array_union(
                    F.array(F.col("label")),
                    F.array_union(
                        F.coalesce("alt_labels", F.array()),
                        F.coalesce("hidden_labels", F.array()),
                    ),
                )
            ).alias("variant"),
        )
        .withColumn("variant", F.lower(F.trim("variant")))
        .distinct()
    )
    rank_expr = F.lit(99)
    for role, r in sorted(ROLE_RANK.items(), key=lambda kv: -kv[1]):
        rank_expr = F.when(F.col("role") == role, F.lit(r)).otherwise(rank_expr)
    cand = (
        contacts.withColumn("variant", F.lower(F.trim("name")))
        .join(variants, "variant")
        .withColumn("role_rank", rank_expr)
    )
    w = Window.partitionBy("record_id").orderBy("role_rank", "org_label")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("record_id", "org_label", "role")
    )
