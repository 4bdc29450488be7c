"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``: flagship extraction pipeline on sf0.001.
``queries()``/``oracle_sql()``: operator registry in
``open_parse_spark/plans/queries.py`` — each SQL-checked entry aligns column
names/types with its DuckDB oracle; parse-pipeline entries are rows-only
(per-turn byte equality is covered by tests/ against the single-threaded
oracle, which is the reference-semantics code path).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from open_parse_spark.plans.queries import (  # noqa: E402
    oracle_sql as _oracle_sql,
    q_parse_flagship,
    queries as _queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_parse_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracle_sql()
