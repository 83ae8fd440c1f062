"""Transcript corpus: deterministic synthetic generator + document identity.

The engine's primary input (BASELINE.json ``input_hint``) is a table of
multi-turn conversation / agent transcripts:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. Document unit = one turn; ``doc_id = conv_id || ':' ||
turn_idx`` — the analogue of the reference's ``_id = uuid`` upsert key
(``IndexerMetadataServiceImpl.java:430-434``).

Doc ordinals: a dense int64 assigned in stable ``(conv_id, turn_idx)`` order
— the compressible docID space postings are delta-encoded over. Assignment
is the scalable two-pass scheme (range partition → per-partition counts →
offset cumsum → per-partition enumeration), NOT a single global window,
so it survives 10^12 rows: the only driver-side state is one count per
partition.

Generation is distributed (``spark.range`` → ``mapInPandas``) and seeded
per-conversation, so the corpus is identical regardless of parallelism —
the property the local[8]-vs-local[32] scaling run depends on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# above this many partitions the ordinal offset map ships as a broadcast
# join instead of a constant-folded map literal (plan-bloat threshold)
ORDINAL_OFFMAP_MAX = 10_000

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_P = np.array([0.45, 0.45, 0.02, 0.08])
TOOLS = np.array(["bash", "search", "browser", "editor", "python"])

_SYLLABLES = [
    "ba", "co", "da", "el", "fi", "gu", "ha", "in", "jo", "ka",
    "lu", "me", "no", "or", "pa", "qui", "ra", "su", "ta", "ve",
]


def _vocabulary(size: int = 5000) -> np.ndarray:
    """Deterministic pseudo-word vocabulary; rank order = Zipf rank."""
    words = []
    i = 0
    while len(words) < size:
        a = _SYLLABLES[i % 20]
        b = _SYLLABLES[(i // 20) % 20]
        c = _SYLLABLES[(i // 400) % 20]
        words.append(a + b + (c if i >= 400 else ""))
        i += 1
    return np.array(words, dtype=object)


# Fixture oddities sprinkled in to exercise every analyzer stage (FIXTURES.md §1)
_ODDITIES = np.array(
    [
        "the", "and", "of", "to", "is",  # stop words (hot terms)
        "42", "2024",  # bare numbers
        "café",  # diacritics
        "et", "al.",  # et-al stop fixture
        "<b>bold</b>",  # html fragment
        "123e4567-e89b-12d3-a456-426614174000",  # uuid-shaped token
    ],
    dtype=object,
)


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    turns_per_conv: int = 10,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic Zipfian transcript corpus (hot terms exercise the
    skew-mitigation path), generated in parallel on executors."""
    vocab = _vocabulary()
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    zipf_p = 1.0 / (ranks + 2.7)
    zipf_p /= zipf_p.sum()
    base_epoch = 1_700_000_000  # fixed; no wall-clock

    def gen(batches):
        # one vectorized pass per Arrow batch of conversation ids: a single
        # seeded RNG stream per conv keeps determinism (identical corpus at
        # any parallelism) while all array work happens batch-at-once
        for pdf in batches:
            convs = pdf["id"].to_numpy(np.int64)
            if len(convs) == 0:
                continue
            nt_all, role_all, tool_all, tok_parts = [], [], [], []
            for conv in convs:
                rng = np.random.default_rng(seed * 1_000_003 + int(conv))
                n_tokens = rng.integers(5, 60, size=turns_per_conv)
                total = int(n_tokens.sum())
                toks = rng.choice(vocab, size=total, p=zipf_p)
                odd_mask = rng.random(total) < 0.03
                toks[odd_mask] = rng.choice(_ODDITIES, size=int(odd_mask.sum()))
                nt_all.append(n_tokens)
                role_all.append(rng.choice(ROLES, size=turns_per_conv, p=ROLE_P))
                tool_all.append(rng.choice(TOOLS, size=turns_per_conv))
                tok_parts.append(toks)
            n_tokens = np.concatenate(nt_all)
            roles = np.concatenate(role_all)
            tools_raw = np.concatenate(tool_all)
            flat = np.concatenate(tok_parts)
            bounds = np.concatenate(([0], np.cumsum(n_tokens)))
            texts = [
                " ".join(flat[bounds[i] : bounds[i + 1]])
                for i in range(len(n_tokens))
            ]
            turn_idx = np.tile(np.arange(turns_per_conv, dtype=np.int32), len(convs))
            conv_rep = np.repeat(convs, turns_per_conv)
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(conv_rep).map("conv{:08d}".format),
                    "turn_idx": turn_idx,
                    "role": roles,
                    "text": texts,
                    "tool": np.where(roles == "tool", tools_raw, None),
                    "ts": pd.to_datetime(
                        base_epoch + conv_rep * 3600 + turn_idx * 7, unit="s"
                    ),
                }
            )

    parts = partitions or max(1, min(n_convs, spark.sparkContext.defaultParallelism))
    return spark.range(0, n_convs, numPartitions=parts).mapInPandas(
        gen, TRANSCRIPT_SCHEMA
    )


def documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver-provided ``documents`` table to the transcript shape
    so the same engine runs over it (doc_id → conv_id, single-turn convs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("lang").alias("role"),  # stands in for a boostable field
        F.col("text"),
        F.col("source").alias("tool"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )


def assign_doc_ordinals(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
    assume_sorted: bool = False,
) -> DataFrame:
    """Dense int64 ``doc_ord`` in stable ``key_cols`` order, scalably.

    Two passes over one range-partitioned, sorted shuffle:
    1. count rows per physical partition (driver holds one long per
       partition — O(partitions), not O(rows));
    2. per-partition enumeration offset by the exclusive prefix sum.

    Range partitioning guarantees partition p's keys all precede partition
    p+1's, and the within-partition sort orders the rest, so ordinals are
    globally consistent with ``ORDER BY key_cols``.

    ``assume_sorted=True`` skips the shuffle (and the range-partitioner
    sampling pass) when the input is ALREADY globally ordered by
    ``key_cols`` across its partitions — e.g. an Iceberg/Parquet table
    maintained sorted by (conv_id, turn_idx), which is this table's
    standard layout, or the seeded synthetic corpus (conversation ranges
    per partition). The counting pass is then the only extra traversal.
    """
    src = None
    if assume_sorted:
        part = df.withColumn("_pid", F.spark_partition_id())
    else:
        # evaluate the input ONCE: the range partitioner's sampling pass
        # and the exchange itself would each re-run the source plan
        # (guide §2.3/§5 — for a generator/join/union source that is the
        # whole input computed twice); the cache is dropped as soon as
        # the shuffled+persisted `part` is materialized below
        src = df.persist(StorageLevel.MEMORY_AND_DISK)
        n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        part = (
            src.repartitionByRange(n, *key_cols)
            .sortWithinPartitions(*key_cols)
            .withColumn("_pid", F.spark_partition_id())
        )
    part.persist(StorageLevel.MEMORY_AND_DISK)
    # the counting pass doubles as a LAYOUT GUARD for the enumeration
    # below, which decodes monotonically_increasing_id as
    # (partition_id << 33) | local_counter — a documented-as-current
    # Spark implementation detail. Verify it per partition in the same
    # aggregate (mid is deterministic per evaluation over the cached,
    # order-fixed partitions): the local counter must be dense
    # (max+1 == count), the upper bits must equal the partition id, and
    # no partition may overflow the 33-bit counter. A future layout
    # change or a 2^33-row partition then fails loudly instead of
    # silently misnumbering doc_ord (review finding).
    _guard_rows = (
        part.select("_pid", F.monotonically_increasing_id().alias("_mid"))
        .groupBy("_pid")
        .agg(
            F.count("*").alias("cnt"),
            F.max(F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))).alias("max_lix"),
            F.max(F.shiftright(F.col("_mid"), 33)).alias("pid_bits"),
        )
        .collect()
    )
    for r in _guard_rows:
        if r["cnt"] > (1 << 33):
            raise RuntimeError(
                f"partition {r['_pid']} holds {r['cnt']} rows — beyond the "
                "33-bit per-partition counter of monotonically_increasing_id; "
                "repartition the input more finely before ordinal assignment"
            )
        if r["cnt"] and (r["max_lix"] + 1 != r["cnt"] or r["pid_bits"] != r["_pid"]):
            raise RuntimeError(
                "monotonically_increasing_id bit layout changed "
                f"(partition {r['_pid']}: count={r['cnt']}, "
                f"max_local={r['max_lix']}, pid_bits={r['pid_bits']}) — "
                "doc_ord enumeration would be corrupt; update the decode in "
                "assign_doc_ordinals"
            )
    if src is not None:  # `part` is materialized by the guard collect
        src.unpersist()
    counts = {r["_pid"]: r["cnt"] for r in _guard_rows}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    # enumeration is pure JVM (whole-stage-codegen'd): Spark's
    # monotonically_increasing_id is (partition_id << 33) + local row
    # counter in partition order, so the within-partition index is
    # mid & (2^33 - 1) and doc_ord = exclusive-prefix-sum offset + index.
    # This replaces the former mapInPandas enumeration pass — the ordinal
    # stage's flattest-scaling component in the 8→32 decomposition
    # (ORDINALS_DECOMP.json) — with a column expression: no Python
    # workers, no Arrow round trip, same deterministic ordinals (cached
    # partition content and order are fixed by the shuffle+sort above,
    # or by the caller's assume_sorted contract).
    local_mask = (1 << 33) - 1
    local_ix = F.monotonically_increasing_id().bitwiseAND(F.lit(local_mask))
    if len(counts) <= ORDINAL_OFFMAP_MAX:
        # constant-folded map literal: offset lookup fuses into codegen
        off_map = (
            F.create_map(
                *[x for pid in sorted(counts) for x in (F.lit(pid), F.lit(offsets[pid]))]
            )
            if counts
            else F.create_map(F.lit(-1), F.lit(0))  # empty input: never fires
        )
        out = part.withColumn(
            "doc_ord",
            (F.element_at(off_map, F.col("_pid")) + local_ix).cast("long"),
        ).drop("_pid")
    else:
        # 10^5+ partitions: a map literal that size bloats every serialized
        # task plan (the same hazard class as a giant IN-list) — ship the
        # offsets as a broadcast-joined DataFrame instead
        import pandas as pd

        off_df = df.sparkSession.createDataFrame(
            pd.DataFrame(
                {
                    "_pid": np.fromiter(sorted(counts), dtype=np.int64),
                    "_off": np.fromiter(
                        (offsets[p] for p in sorted(counts)), dtype=np.int64
                    ),
                }
            )
        )
        out = (
            part.withColumn("_lix", local_ix)
            .join(F.broadcast(off_df), "_pid")
            .withColumn("doc_ord", (F.col("_off") + F.col("_lix")).cast("long"))
            .drop("_pid", "_off", "_lix")
        )
    # let callers release the cached shuffle once downstream stages are
    # materialized (build_index unpersists after doc_stats is written);
    # total count rides along for free (sum of per-partition counts)
    out._persisted_parent = part
    out._total_count = acc
    return out


def with_doc_ids(df: DataFrame) -> DataFrame:
    """doc_id = conv_id:turn_idx (reference ``_id`` analogue)."""
    return df.withColumn(
        "doc_id", F.concat_ws(":", F.col("conv_id"), F.col("turn_idx").cast("string"))
    )
