"""Extraction-quality eval harness.

The reference's eval harness re-parses a PDF corpus and writes bbox-annotated
PDFs for human inspection (``/root/reference/src/evals/run_evals.py:10-27`` —
no assertions, purely visual).  At 10^12 turns nobody inspects PDFs; the
replacement is a metrics relation computed from the parse output that a
human (or alerting) reads instead:

- corpus-level: node/token distributions, variant mix, parse error rate
- doc-level outliers: turns whose extraction looks pathological (zero nodes,
  one giant node, error rows)

Pure aggregations over the node output — one shuffle each, safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def extraction_metrics(nodes: DataFrame) -> DataFrame:
    """One-row corpus summary of extraction quality."""
    per_turn = nodes.groupBy("conv_id", "turn_idx").agg(
        F.sum(F.when(F.col("node_idx") >= 0, 1).otherwise(0)).alias("n_nodes"),
        F.sum(F.when(F.col("node_idx") < 0, 1).otherwise(0)).alias("n_errors"),
        F.sum("tokens").alias("turn_tokens"),
        F.max("tokens").alias("max_node_tokens"),
    )
    return per_turn.agg(
        F.count(F.lit(1)).alias("turns"),
        F.sum("n_nodes").alias("nodes"),
        F.sum("n_errors").alias("parse_errors"),
        F.round(F.avg("n_nodes"), 4).alias("avg_nodes_per_turn"),
        F.expr("percentile_approx(n_nodes, 0.5)").alias("p50_nodes_per_turn"),
        F.expr("percentile_approx(n_nodes, 0.99)").alias("p99_nodes_per_turn"),
        F.sum("turn_tokens").alias("tokens"),
        F.expr("percentile_approx(turn_tokens, 0.99)").alias("p99_turn_tokens"),
        F.max("max_node_tokens").alias("max_node_tokens"),
        # a turn with zero output rows is invisible here; a group with
        # n_nodes == 0 exists only when the turn produced error rows
        F.sum(F.when(F.col("n_nodes") == 0, 1).otherwise(0)).alias(
            "turns_with_only_errors"
        ),
    )


def variant_mix(nodes: DataFrame) -> DataFrame:
    """Node counts by variant combination (text/table/image mixes)."""
    return (
        nodes.where(F.col("node_idx") >= 0)
        .groupBy(F.array_join(F.col("variant"), "+").alias("variant_mix"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("tokens").alias("tokens"),
        )
    )


def outlier_turns(
    nodes: DataFrame, max_tokens_per_node: int = 4096
) -> DataFrame:
    """Turns worth a human look: parse errors, zero-node turns cannot appear
    here (they produce no rows), giant single nodes, suspicious repeats."""
    flagged = nodes.where(
        (F.col("node_idx") < 0) | (F.col("tokens") > max_tokens_per_node)
    )
    return flagged.select(
        "conv_id",
        "turn_idx",
        "node_idx",
        "tokens",
        F.when(F.col("node_idx") < 0, F.lit("parse_error"))
        .otherwise(F.lit("giant_node"))
        .alias("flag"),
        "parse_error",
    )
