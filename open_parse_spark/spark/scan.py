"""Scan-parallelism guard for CPU-heavy map operators.

Byte-ranged parquet splits parallelize down to ROW GROUPS, not rows: a
small table written as a single row group scans as ONE task no matter what
``spark.sql.files.maxPartitionBytes`` says, and every CPU-heavy map stage
above it (regex n-gram expansion, per-word hashing, Arrow UDF batches)
serializes on one core while the rest of the cluster idles.  The bytes are
tiny exactly when this happens, so moving them once is milliseconds while
the serialized compute is seconds — the same trade ``parse_transcripts``
makes for the parse (guide §2.5: input skew / unsplittable input).

``ensure_parallelism`` is a no-op whenever the plan already has at least
the session's core count of partitions — at real corpus scale the natural
splits vastly exceed it and nothing is shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ensure_parallelism(
    df: DataFrame, key_col: str | None = None, factor: int = 1
) -> DataFrame:
    """Repartition ``df`` to ``factor x defaultParallelism`` partitions when
    its physical plan yields fewer than ``defaultParallelism`` — otherwise
    return it untouched.  ``key_col`` (a unique id column) makes the
    exchange a deterministic hash partitioning; without it a round-robin
    repartition is used (deterministic under retries via Spark's
    sort-before-repartition default)."""
    try:
        spark = df.sparkSession
        par = spark.sparkContext.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:
        # streaming sources / Connect plans: no cheap partition probe — the
        # caller's plan is left untouched
        return df
    if n >= par:
        return df
    if key_col is not None:
        return df.repartition(factor * par, F.col(key_col))
    return df.repartition(factor * par)
