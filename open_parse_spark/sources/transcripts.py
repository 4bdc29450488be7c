"""Transcript table source — Iceberg first, parquet fallback.

The production input (BASELINE.json `input_hint`) is an Iceberg table of
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` bucketed by conv_id.  This sandbox has no Iceberg runtime
jars, so loading degrades to parquet paths transparently; the pipeline only
depends on the DataFrame shape.

Production layout recommendations (encoded here so deployments inherit them):

- `PARTITIONED BY (bucket(N, conv_id))` — bucket count sized so one bucket
  ~= one resume unit (`checkpoint.py` anti-joins whole buckets; with Iceberg
  the wave write + checkpoint append become one atomic snapshot commit).
- `write.target-file-size-bytes` <= 128 MB and row groups <= 16 MB so the
  zero-shuffle parse gets enough scan splits at any executor count
  (`pipeline.py` auto mode re-splits by `maxPartitionBytes` from file
  metadata).
- sort order (conv_id, turn_idx) within files: keeps per-conversation reads
  clustered for downstream conversation-level ops without forcing a shuffle
  here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # Class.forName throws if the Iceberg runtime jar is absent
        # (plain attribute access on _jvm returns lazy JavaPackage objects)
        spark._jvm.java.lang.Class.forName(  # type: ignore[attr-defined]
            "org.apache.iceberg.catalog.Catalog"
        )
        return True
    except Exception:
        return False


def load_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Load the transcripts table from an Iceberg table name (contains no
    '/') or a parquet path."""
    if "/" not in source and iceberg_available(spark):
        df = spark.read.format("iceberg").load(source)
    elif "/" not in source:
        # table name without Iceberg runtime: try the session catalog
        df = spark.table(source)
    else:
        df = spark.read.parquet(source)
    missing = [c for c in TRANSCRIPT_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"transcripts source {source!r} missing columns {missing}")
    return df.select(*TRANSCRIPT_COLUMNS)


def write_nodes(
    nodes: DataFrame,
    target: str,
    mode: str = "overwrite",
    partition_cols: tuple = ("bucket",),
) -> None:
    """Write node output — Iceberg table (atomic snapshot) or parquet dirs
    (per-bucket dynamic overwrite, see checkpoint.py for the resume
    protocol)."""
    if "/" not in target and iceberg_available(nodes.sparkSession):
        writer = nodes.writeTo(target)
        if mode == "overwrite":
            writer.overwritePartitions()
        else:
            writer.append()
        return
    missing = [c for c in partition_cols if c not in nodes.columns]
    if missing:
        # silently writing unpartitioned would turn the per-bucket dynamic
        # overwrite into a FULL-target overwrite, deleting every committed
        # bucket from earlier waves (review finding)
        raise ValueError(
            f"partition columns {missing} absent from nodes "
            f"(have {nodes.columns}); refusing a non-partitioned overwrite"
        )
    (
        nodes.write.mode(mode)
        .partitionBy(*partition_cols)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(target)
    )
