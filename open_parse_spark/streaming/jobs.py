"""Structured Streaming variants of the pipeline.

The reference has no streaming (SURVEY §2.6); these exist because a
transcript corpus at 10^12 turns is typically fed incrementally.  Both jobs
are the streaming twins of batch operators in this repo, sharing the same
parse/aggregation code:

- ``streaming_parse``: file-source ``readStream`` over the transcripts table
  -> the same ``mapInPandas`` parse as batch (mapInPandas is supported on
  streaming DataFrames; the job is stateless, so exactly-once comes from the
  source offsets + sink commit log, complementing the batch checkpoint
  table).
- ``streaming_events_hourly``: watermarked tumbling-window aggregation over
  the events table — the streaming twin of ``q_events_hourly``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from open_parse_spark.spark.pipeline import NODE_SCHEMA, _parse_partition

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def streaming_parse(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """readStream(parquet transcripts) -> content nodes (unbounded)."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    pruned = stream.select("conv_id", "turn_idx", "text", "tool")
    return pruned.mapInPandas(_parse_partition, schema=NODE_SCHEMA)


def streaming_events_hourly(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling 1h window per event_type; late rows beyond the
    watermark are dropped, state is bounded (the 100 TB requirement for any
    unbounded aggregation)."""
    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .parquet(input_dir)
    )
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "min_value",
            "max_value",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, mode: str = "append"
):
    """Test helper: drain a stream into an in-memory table."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
