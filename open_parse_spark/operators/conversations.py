"""Conversation-level operators over transcripts / parsed nodes.

The corpus unit is the multi-turn conversation (BASELINE.json input_hint);
these compose turn-level parse output into conversation-granularity training
artifacts:

- conversation assembly: all of a conversation's nodes in (turn_idx,
  node_idx) order -> one document per conversation
- context windows: per turn, the trailing-k-turn context (the shape used to
  cut training samples from agent transcripts)
- conversation stats: per-conv size/skew metrics (the inputs to the
  partition planner's histogram at conv granularity)

Scale: everything is one shuffle on conv_id (the table's bucket key, so with
bucketed Iceberg input these become shuffle-free scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def conversation_assembly(nodes: DataFrame, delimiter: str = "\n\n") -> DataFrame:
    """Parsed nodes -> one row per conversation with reading-ordered text.

    Ordering is (turn_idx, node_idx) via sort_array over structs — exact and
    shuffle-minimal (single groupBy on conv_id)."""
    return (
        nodes.groupBy("conv_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("turn_idx"), F.col("node_idx"), F.col("text"))
                )
            ).alias("_n"),
            F.count_distinct("turn_idx").alias("n_turns"),
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("tokens").alias("tokens"),
        )
        .select(
            "conv_id",
            "n_turns",
            "n_nodes",
            "tokens",
            F.array_join(F.col("_n.text"), delimiter).alias("conversation_text"),
        )
    )


def turn_context_windows(
    transcripts: DataFrame, context_turns: int = 3
) -> DataFrame:
    """Per turn: the trailing-k-turn context (ids + total chars) — the
    sample-cutting shape for agent-transcript training data."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-(context_turns - 1), 0)
    )
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.count(F.lit(1)).over(w).alias("context_n_turns"),
        F.sum(F.length("text")).over(w).alias("context_chars"),
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation size metrics (conv-granularity skew inputs)."""
    return transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.length("text")).alias("total_chars"),
        F.max(F.length("text")).alias("max_turn_chars"),
        F.count_distinct("role").alias("n_roles"),
        F.min("turn_idx").alias("first_turn"),
        F.max("turn_idx").alias("last_turn"),
    )


def conversation_fingerprint_dedup(transcripts: DataFrame) -> DataFrame:
    """Conversation-granularity dedup: two conversations are duplicates when
    their normalized assembled transcripts (turn-ordered, whitespace/punct/
    case-folded) hash equal.  The corpus unit is the conversation, so dedup
    must see whole conversations — turn-level dedup cannot catch a re-logged
    conversation whose turns each appear twice legitimately.

    One shuffle on conv_id (bucket key -> shuffle-free on bucketed input)
    then one on the 128-bit fingerprint (uniform)."""
    assembled = transcripts.groupBy("conv_id").agg(
        F.array_join(
            F.sort_array(
                F.collect_list(F.struct(F.col("turn_idx"), F.col("text")))
            ).getField("text"),
            "\n",
        ).alias("conv_text")
    )
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("conv_text")), "[^a-z0-9]+", " ")
    )
    # conversations with no [a-z0-9] at all (non-Latin scripts, emoji-only)
    # would ALL normalize to "" and collapse into one bogus dup group
    # (review finding) — fall back to fingerprinting the raw text, which
    # still groups byte-identical conversations
    fp = F.md5(F.when(norm == "", F.col("conv_text")).otherwise(norm))
    return (
        assembled.select("conv_id", fp.alias("conv_fp"))
        .groupBy("conv_fp")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("conv_id").alias("keep_conv_id"),
        )
    )


def role_sequence_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation dialogue-shape metrics: turns per role, whether the
    conversation starts with a user turn, and how often consecutive turns
    repeat a role (training pipelines filter mis-stitched transcripts on
    exactly these)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    with_prev = transcripts.select(
        "conv_id",
        "role",
        "turn_idx",
        F.lag("role").over(w).alias("prev_role"),
        F.row_number().over(w).alias("rn"),
    )
    return with_prev.groupBy("conv_id").agg(
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("user_turns"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
            "assistant_turns"
        ),
        F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).alias("tool_turns"),
        F.max(F.when(F.col("rn") == 1, F.col("role") == "user")).alias(
            "starts_with_user"
        ),
        F.sum(
            F.when(F.col("role") == F.col("prev_role"), 1).otherwise(0)
        ).alias("repeated_role_runs"),
    )
