"""Lineage-truncating materialization that is safe at cluster scale.

Iterative operators (connected components, Lloyd's k-means) and multi-consumer
relations (the pruned gram table) need their lineage cut once per step or the
plan — and the recomputation a failure triggers — grows without bound.  On
``local[*]`` the right tool is ``localCheckpoint``: executor-local storage,
no HDFS round-trip, measured 2.7x plan-reuse win.  On a real cluster that
storage dies with its executor and a single executor loss fails the whole
job, so the default flips to a *reliable* checkpoint (HDFS/object-store
backed via ``spark.sparkContext.setCheckpointDir``) when one is configured.

Resolution order for :func:`stage`:

- ``spark.open_parse.stage=local``   -> always ``localCheckpoint``
- ``spark.open_parse.stage=reliable``-> always ``DataFrame.checkpoint``
  (requires a checkpoint dir; raises otherwise — misconfiguration should
  fail loudly, not silently run the unsafe path)
- ``spark.open_parse.stage=auto`` (default) -> ``localCheckpoint`` on
  ``local[*]`` masters; on cluster masters a reliable checkpoint when a
  checkpoint dir is set, else ``localCheckpoint`` with a one-time warning.

Spark Connect sessions have no driver-side ``SparkContext``; there the
local/auto paths still work (``localCheckpoint`` is supported over Connect
since 4.0) and only ``reliable`` raises, pointing at the server-side config.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

_warned = False


def stage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage; see module docstring for mode resolution."""
    global _warned
    spark = df.sparkSession
    mode = spark.conf.get("spark.open_parse.stage", "auto")
    if mode not in ("local", "reliable", "auto"):
        # a typo ('relaible') must not silently run the cluster-auto path —
        # the module's whole stance is that misconfiguration fails loudly
        raise ValueError(
            f"spark.open_parse.stage={mode!r}: expected one of "
            "'local', 'reliable', 'auto'"
        )
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    try:
        sc = spark.sparkContext
        master = spark.conf.get("spark.master")
    except Exception:
        # Spark Connect: no SparkContext client-side.  localCheckpoint works
        # there; only the reliable path needs the driver JVM handle.
        if mode == "reliable":
            raise RuntimeError(
                "spark.open_parse.stage=reliable needs a driver-side "
                "SparkContext (set the checkpoint dir on the Connect "
                "server and run the job there, or use mode=local)"
            )
        return df.localCheckpoint(eager=eager)
    if mode == "auto" and master.startswith("local"):
        return df.localCheckpoint(eager=eager)
    has_dir = sc.getCheckpointDir() is not None
    if mode == "reliable" and not has_dir:
        raise RuntimeError(
            "spark.open_parse.stage=reliable requires "
            "spark.sparkContext.setCheckpointDir(...)"
        )
    if has_dir:
        return df.checkpoint(eager=eager)
    if not _warned:
        warnings.warn(
            "cluster master without a checkpoint dir: falling back to "
            "localCheckpoint — an executor loss will fail the job; call "
            "spark.sparkContext.setCheckpointDir(...) for fault tolerance",
            stacklevel=2,
        )
        _warned = True
    return df.localCheckpoint(eager=eager)
