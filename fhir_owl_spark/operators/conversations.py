"""Per-conversation operators.

``conversation_features`` (the DEFAULT) is pure Column code: one window
for the inter-turn gap + one groupBy on conv_id — both partitioned on
conv_id, so Catalyst emits ONE Exchange and the whole computation stays
inside whole-stage codegen, no Python in the hot path.
``conversation_features_grouped`` computes the identical schema with one
Arrow batch per conversation group (applyInPandas); it exists as the
documented extension seam for context-dependent per-conversation scoring
(mention disambiguation using surrounding turns), which Column code
cannot express — tests assert the two paths agree row-for-row.

Scale shape: one shuffle on conv_id; conversations are bounded (10^2-10^3
turns), so group memory is bounded; skewed giant conversations are the
pathological case — cap enforced via cfg in the caller if needed.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CONV_FEATURES = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("n_user_turns", LongType()),
        StructField("total_chars", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
        StructField("max_gap_s", DoubleType()),
        StructField("max_gap_us", LongType()),
        StructField("n_roles", IntegerType()),
    ]
)


def conversation_features(transcripts: DataFrame) -> DataFrame:
    """Per-conversation shape statistics (CONV_FEATURES schema), pure
    Column implementation.

    The gap is computed against the previous NON-NULL timestamp in turn
    order (last(ignorenulls) over the preceding frame), matching the
    grouped-map path's dropna-then-diff semantics — a NULL ts in the
    middle of a conversation must not sever the gap chain. Microsecond
    integers throughout: float seconds on epoch-scale timestamps lose
    sub-microsecond precision and break cross-engine value equality
    (the DuckDB oracle subtracts epoch_us bigints).
    """
    from pyspark.sql.window import Window

    prev_ts = F.last("ts", ignorenulls=True).over(
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gap_us = F.when(
        F.col("ts").isNotNull(),
        F.timestamp_diff("MICROSECOND", prev_ts, F.col("ts")),
    )
    max_gap_us = F.coalesce(F.max("_gap_us"), F.lit(0)).cast("long")
    return (
        transcripts.withColumn("_gap_us", gap_us)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
            .cast("long")
            .alias("n_user_turns"),
            F.sum(F.length(F.coalesce("text", F.lit(""))))
            .cast("long")
            .alias("total_chars"),
            # cast to TIMESTAMP to match the declared CONV_FEATURES schema
            # on NTZ inputs too (the grouped-map path always emits
            # TimestampType); the gap itself is computed on the ORIGINAL
            # ts via timestamp_diff, which is timezone-independent
            F.min("ts").cast("timestamp").alias("first_ts"),
            F.max("ts").cast("timestamp").alias("last_ts"),
            (max_gap_us / F.lit(1e6)).alias("max_gap_s"),
            max_gap_us.alias("max_gap_us"),
            F.size(F.collect_set("role")).cast("int").alias("n_roles"),
        )
    )


def conversation_features_grouped(transcripts: DataFrame) -> DataFrame:
    """Grouped-map (applyInPandas) twin of ``conversation_features`` —
    the extension seam for context-dependent per-conversation scoring
    that Column code cannot express. Same CONV_FEATURES schema; tests
    assert equality with the Column default."""
    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        ts = pdf["ts"]
        # exact integer-microsecond gaps: float total_seconds() on epoch-scale
        # timestamps loses sub-microsecond precision, which breaks
        # cross-engine value equality (the DuckDB oracle computes the same
        # quantity via epoch_us bigint subtraction)
        # drop NaT BEFORE the int64 view: NaT casts to int64-min, which
        # dropna() would keep and turn into astronomically large garbage
        # gaps. Normalize to ns (Arrow may hand us datetime64[us], whose
        # int64 view would be µs, not ns).
        ts_valid = ts.dropna()
        gaps_us = (
            ts_valid.astype("datetime64[ns]").astype("int64").diff().dropna() // 1000
        )
        max_gap_us = int(gaps_us.max()) if len(gaps_us) else 0
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n_turns": [len(pdf)],
                "n_user_turns": [int((pdf["role"] == "user").sum())],
                "total_chars": [int(pdf["text"].fillna("").str.len().sum())],
                "first_ts": [ts.min()],
                "last_ts": [ts.max()],
                "max_gap_s": [max_gap_us / 1e6],
                "max_gap_us": [max_gap_us],
                "n_roles": [int(pdf["role"].nunique())],
            }
        )

    return transcripts.groupBy("conv_id").applyInPandas(per_conv, CONV_FEATURES)


def sessionize(
    transcripts: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Batch sessionization: split each conversation into sessions at
    inactivity gaps > ``gap`` (the batch analog of the streaming session
    operator in streaming/sessions.py).

    session_idx = cumulative count of gap-exceeding boundaries, via lag +
    a running sum over (conv_id, turn order) — ONE window (one shuffle on
    conv_id), no UDF, no self-join. Appends session_idx (0-based) and
    gap_us (microseconds since the previous turn; null on the first).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # timestamp_diff works on TIMESTAMP and TIMESTAMP_NTZ alike and is
    # timezone-independent (unix_micros rejects NTZ, and a cast through
    # session time would shift gaps across DST boundaries)
    gap_us = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
    threshold_us = F.lit(int(pd.Timedelta(gap).total_seconds() * 1_000_000))
    is_break = F.when(gap_us > threshold_us, 1).otherwise(0)
    running = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return transcripts.withColumns(
        {
            "gap_us": gap_us,
            "session_idx": F.sum(is_break).over(running).cast("int"),
        }
    )


def tool_transitions(transcripts: DataFrame) -> DataFrame:
    """Corpus-wide tool-call bigram counts: how often tool B directly
    follows tool A within a conversation (intervening non-tool turns are
    skipped — the sequence is over TOOL turns in turn order). The
    workflow-mining view of agent transcripts: dominant chains, loops
    (A→A), and entry points (prev_tool null for each conversation's first
    tool call).

    One window over (conv_id, turn order among tool turns) + one global
    bigram aggregation — both map-side combined; the bigram key space is
    |tools|², tiny at any corpus size.
    """
    from pyspark.sql.window import Window

    t = transcripts.filter(F.col("tool").isNotNull())
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = t.select(
        F.lag("tool").over(w).alias("prev_tool"), F.col("tool")
    )
    return pairs.groupBy("prev_tool", "tool").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


def render_conversations(transcripts: DataFrame, sep: str = "\n") -> DataFrame:
    """Flatten each conversation into ONE training document (the SFT-prep
    step): turns in turn_idx order rendered as ``role: text`` lines.

    One shuffle on conv_id; collect_list is bounded by conversation
    length (10^2-10^3 turns by contract). The in-group ordering is done
    with array_sort over (turn_idx, …) structs — struct comparison is
    lexicographic and turn_idx is unique per conversation, so the render
    is deterministic under any partitioning.
    """
    rows = F.array_sort(F.collect_list(F.struct("turn_idx", "role", "text")))
    # role coalesced like text: a NULL role would null the whole line and
    # concat_ws would silently DROP that turn while n_turns still counts it
    rendered = F.concat_ws(
        sep,
        F.transform(
            rows,
            lambda r: F.concat(
                F.coalesce(r.role, F.lit("")),
                F.lit(": "),
                F.coalesce(r.text, F.lit("")),
            ),
        ),
    )
    return transcripts.groupBy("conv_id").agg(
        rendered.alias("text"), F.count(F.lit(1)).alias("n_turns")
    )


def tool_usage(transcripts: DataFrame) -> DataFrame:
    """Per-conversation tool-call analytics over agent transcripts — the
    ``tool`` column of the input shape (conv_id, turn_idx, role, text,
    tool, ts): how many tool calls, how many distinct tools, the dominant
    tool, and the first/last tool invoked in turn order.

    Scale shape: everything derives from ONE bounded intermediate —
    per-(conv_id, tool) partial counts — so the plan is two hash
    aggregations with map-side combine (shuffle keys (conv_id, tool) then
    conv_id), no window, no join, no Python. Dominant-tool ties break
    deterministically toward the lexicographically GREATEST tool name
    (max of a (calls, tool) struct); first/last use min_by/max_by on the
    per-tool min/max turn index, which are unique per conversation.
    """
    per_tool = (
        transcripts.filter(F.col("tool").isNotNull())
        .groupBy("conv_id", "tool")
        .agg(
            F.count(F.lit(1)).alias("calls"),
            F.min("turn_idx").alias("min_turn"),
            F.max("turn_idx").alias("max_turn"),
        )
    )
    top = F.max(F.struct(F.col("calls"), F.col("tool"))).alias("top")
    return (
        per_tool.groupBy("conv_id")
        .agg(
            F.sum("calls").alias("n_tool_calls"),
            F.count(F.lit(1)).alias("n_distinct_tools"),
            top,
            F.min_by("tool", "min_turn").alias("first_tool"),
            F.max_by("tool", "max_turn").alias("last_tool"),
        )
        .select(
            "conv_id",
            "n_tool_calls",
            "n_distinct_tools",
            F.col("top.tool").alias("top_tool"),
            F.col("top.calls").alias("top_tool_calls"),
            "first_tool",
            "last_tool",
        )
    )


def sft_pairs(
    transcripts: DataFrame,
    context_turns: int = 3,
    sep: str = "\n",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Instruction-tuning (prompt, response) pair extraction — the other
    half of SFT prep next to ``render_conversations``: every assistant
    turn becomes one training example whose prompt is the up-to-
    ``context_turns`` immediately preceding turns rendered as
    ``role: text`` lines, and whose response is the turn's own text.
    Assistant turns with NO preceding context are dropped (nothing to
    condition on); a NULL response renders as '' (the turn still
    happened — dropping it would desync pair counts from turn counts).

    Scale shape: ONE shuffle on conv_id; the rolling context is a
    bounded window frame (``rowsBetween(-context_turns, -1)``), so
    per-row state is O(context_turns) regardless of conversation
    length — no conversation-sized collect_list, no Python. The frame
    content is re-sorted via array_sort over (turn_idx, …) structs
    before rendering, so the prompt is deterministic under any
    partitioning (turn_idx is unique per conversation by the input
    contract, same discipline as render_conversations).
    """
    from pyspark.sql.window import Window

    if context_turns < 1:
        raise ValueError(f"context_turns must be >= 1, got {context_turns}")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-context_turns, -1)
    )
    ctx = F.array_sort(
        F.collect_list(F.struct("turn_idx", "role", "text")).over(w)
    )
    # render from the MATERIALIZED _ctx column, not the window expression:
    # referencing the window expr after the role filter would recompute the
    # frame over the filtered (assistant-only) rows
    rendered = F.concat_ws(
        sep,
        F.transform(
            F.col("_ctx"),
            lambda r: F.concat(
                F.coalesce(r.role, F.lit("")),
                F.lit(": "),
                F.coalesce(r.text, F.lit("")),
            ),
        ),
    )
    return (
        transcripts.withColumn("_ctx", ctx)
        .filter(
            (F.col("role") == assistant_role) & (F.size("_ctx") >= 1)
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            rendered.alias("prompt"),
            F.coalesce(F.col("text"), F.lit("")).alias("response"),
        )
    )
