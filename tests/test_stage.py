"""spark/stage.py: lineage-truncating materialization mode resolution
(VERDICT r2 item 7 — localCheckpoint must not be the hardwired default on
cluster masters)."""

import tempfile

import pytest

from open_parse_spark.spark.stage import stage


def test_auto_local_uses_localcheckpoint(spark):
    df = stage(spark.range(10))
    assert df.count() == 10
    # localCheckpoint truncates lineage to a scan of the checkpointed RDD
    assert "Scan ExistingRDD" in df._jdf.queryExecution().executedPlan().toString()


def test_reliable_without_dir_raises(spark):
    spark.conf.set("spark.open_parse.stage", "reliable")
    try:
        with pytest.raises(RuntimeError, match="setCheckpointDir"):
            stage(spark.range(3))
    finally:
        spark.conf.unset("spark.open_parse.stage")


def test_reliable_with_dir_checkpoints(spark):
    with tempfile.TemporaryDirectory() as d:
        spark.sparkContext.setCheckpointDir(d)
        spark.conf.set("spark.open_parse.stage", "reliable")
        try:
            df = stage(spark.range(7))
            assert df.count() == 7
        finally:
            spark.conf.unset("spark.open_parse.stage")


def test_forced_local_mode(spark):
    spark.conf.set("spark.open_parse.stage", "local")
    try:
        assert stage(spark.range(5), eager=False).count() == 5
    finally:
        spark.conf.unset("spark.open_parse.stage")


def test_unknown_mode_raises(spark):
    """A typo ('relaible') must fail loudly, not silently run the
    cluster-auto fallback (ADVICE r3)."""
    spark.conf.set("spark.open_parse.stage", "relaible")
    try:
        with pytest.raises(ValueError, match="relaible"):
            stage(spark.range(3))
    finally:
        spark.conf.unset("spark.open_parse.stage")
