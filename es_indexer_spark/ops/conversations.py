"""Conversation-level operators over the multi-turn transcript table:
ordered re-assembly of turns into rendered training documents, per-
conversation statistics, and last-k context windows for example
construction — the steps between "a table of turns" and "LLM training
documents" that the turn-level ops (dedup, quality, packing) feed on.

Shapes at 10^12 turns:

- everything here is ONE groupBy(conv_id) shuffle; conversations are
  bounded (10^1-10^3 turns), so per-group state is tiny and skew is a
  non-issue (no conversation is a hot key the way a hot term is);
- ordered assembly uses ``array_sort(collect_list(struct(turn_idx, …)))``
  — the struct sorts by its leading field, giving an order-sensitive
  aggregation without a window sort over the whole table (the classic
  Spark rendering of ORDER BY inside an aggregate, all JVM-side);
- rendering is pure string expressions (whole-stage codegen), no Python.

Reference linkage: the reference flattens one metadata record to one
indexed document (StacCollectionMapperService.java:40-71); transcripts
invert that — many turns fold into one training document — so this is
the table-specific analogue of its mapper stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import SQL_TOKENS, tokens_col


def _line(role_col: str = "role", text_col: str = "text") -> Column:
    return F.concat(F.col(role_col), F.lit(": "), F.col(text_col))


def render_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    sep: str = "\n",
) -> DataFrame:
    """Re-assemble each conversation's turns, in ``turn_idx`` order, into
    one rendered training document ``role: text<sep>role: text…`` plus
    turn/token counts. One shuffle; order comes from sorting the
    collected (turn_idx, line) structs per group, not a global sort."""
    lines = (
        df.select(
            F.col(conv_col).alias("conv_id"),
            F.struct(F.col(turn_col).alias("i"), _line().alias("line")).alias("s"),
            F.size(tokens_col("text")).alias("_nt"),
        )
        .groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum("_nt").cast("long").alias("total_tokens"),
            F.array_sort(F.collect_list("s")).alias("turns"),
        )
    )
    return lines.select(
        "conv_id",
        "n_turns",
        "total_tokens",
        F.array_join(F.transform("turns", lambda s: s["line"]), sep).alias("rendered"),
    )


def sql_render_conversations(
    inner: str,
    sep: str = "\n",
) -> str:
    """DuckDB mirror: string_agg with ORDER BY inside the aggregate.
    ``inner`` must yield (conv_id, turn_idx, role, text)."""
    return f"""
select conv_id,
       count(*)::bigint as n_turns,
       sum(len({SQL_TOKENS}))::bigint as total_tokens,
       string_agg(role || ': ' || text, '{sep}' order by turn_idx) as rendered
from ({inner})
group by conv_id
"""


def conversation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
) -> DataFrame:
    """Per-conversation shape statistics: turn counts by role, tool-call
    count, and the event-time span — the features conversation-level
    curation filters on (truncated chats, tool-spam, single-sided
    dialogues)."""
    return (
        df.groupBy(F.col(conv_col).alias("conv_id"))
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
            F.sum((F.col("role") == "assistant").cast("long")).alias("n_assistant"),
            F.sum(F.col("tool").isNotNull().cast("long")).alias("n_tool_calls"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
        )
    )


def sql_conversation_stats(inner: str) -> str:
    return f"""
select conv_id,
       count(*)::bigint as n_turns,
       sum((role = 'user')::bigint)::bigint as n_user,
       sum((role = 'assistant')::bigint)::bigint as n_assistant,
       sum((tool is not null)::bigint)::bigint as n_tool_calls,
       min(ts) as t_start,
       max(ts) as t_end
from ({inner})
group by conv_id
"""


def context_windows(
    df: DataFrame,
    max_context: int = 4,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
) -> DataFrame:
    """(prompt, target) example construction: for every assistant turn,
    the rendered last-``max_context`` preceding turns as the prompt and
    the assistant text as the target — the standard chat-SFT exploding.

    Bounded by construction: each conversation of T turns emits at most
    T examples and each example carries ≤ ``max_context`` turns, so the
    blow-up factor is a constant, not O(T^2). Same single-shuffle
    collect-sort-slice shape as ``render_conversations``."""
    collected = (
        df.select(
            F.col(conv_col).alias("conv_id"),
            F.struct(
                F.col(turn_col).alias("i"),
                F.col("role").alias("role"),
                F.col("text").alias("text"),
            ).alias("s"),
        )
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_list("s")).alias("turns"))
    )
    n = F.size("turns")
    idxs = F.filter(
        F.sequence(F.lit(1), n),
        lambda j: F.element_at(F.col("turns"), j)["role"] == F.lit("assistant"),
    )
    ex = collected.select(
        "conv_id",
        F.explode(idxs).alias("j"),
        F.col("turns"),
    )
    start = F.greatest(F.lit(1), F.col("j") - F.lit(max_context))
    ctx = F.slice(F.col("turns"), start, F.col("j") - start)
    return ex.select(
        "conv_id",
        # the ORIGINAL turn index of the target turn (positions and turn
        # indices differ when numbering has gaps)
        F.element_at(F.col("turns"), F.col("j"))["i"].cast("int").alias("turn_idx"),
        F.array_join(
            F.transform(ctx, lambda s: F.concat(s["role"], F.lit(": "), s["text"])),
            "\n",
        ).alias("prompt"),
        F.element_at(F.col("turns"), F.col("j"))["text"].alias("target"),
    )


def sql_context_windows(inner: str, max_context: int = 4) -> str:
    """DuckDB mirror, POSITIONAL like the Spark side (the last
    ``max_context`` turns by order, not by turn-index arithmetic —
    they differ when turn numbering has gaps): row_number the turns,
    then per assistant turn string_agg the preceding position range."""
    return f"""
with t as (
  select conv_id, turn_idx, role, text,
         row_number() over (partition by conv_id order by turn_idx) as pos
  from ({inner})
)
select a.conv_id,
       a.turn_idx::int as turn_idx,
       coalesce(string_agg(b.role || ': ' || b.text, chr(10) order by b.pos), '')
         as prompt,
       any_value(a.text) as target
from t a
left join t b
  on b.conv_id = a.conv_id
 and b.pos >= a.pos - {max_context}
 and b.pos < a.pos
where a.role = 'assistant'
group by a.conv_id, a.turn_idx
"""
