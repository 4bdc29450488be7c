"""SparkSession factory with the configs this pipeline relies on."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "open-parse-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    arrow_max_records_per_batch: int = 512,
    max_partition_bytes: str = "32m",
) -> SparkSession:
    """Arrow enabled, small Arrow batches (megabyte payloads must not blow up
    executor memory: FIXTURES payloads are log-normal with a heavy tail), AQE
    on for runtime skew handling on top of our explicit repartitioning."""
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(arrow_max_records_per_batch),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # smaller input splits -> scan parallelism even on few large files
        # (payloads are fat rows; 32m keeps per-task memory bounded too)
        .config("spark.sql.files.maxPartitionBytes", max_partition_bytes)
        # NOTE: effective only for python-launched local sessions; under
        # spark-submit the driver JVM heap is fixed at submit time — pass
        # --driver-memory there (review finding)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        # broadcast futures share the driver with python-worker launches; on
        # a contended shared VM (e.g. parallel test shards) the 300 s default
        # has been seen to flake a registry sweep — timing headroom only, no
        # plan change
        .config("spark.sql.broadcastTimeout", "1200")
        .getOrCreate()
    )
