"""Temporal join operators Spark lacks natively, expressed as compositions
of built-in DataFrame ops (SURVEY.md training-data section; no reference
analog — open-parse has no temporal tables).

as-of join: for each left row, the latest right row with the same key and
``right.ts <= left.ts`` (inclusive).  The distributed formulation is the
union+window trick:

1. tag both sides and union them (right side's payload columns prefixed,
   null on left rows),
2. one shuffle: window partitioned by key, ordered by (ts, side, tie) with
   right rows sorting before left rows on timestamp ties (inclusive
   semantics) and a unique tie column making the order total,
3. ``last(payload, ignorenulls=True)`` over ROWS UNBOUNDED PRECEDING..CURRENT
   carries the most recent right payload onto every left row,
4. filter back to left rows.

Scale shape: exactly ONE shuffle on the join key (same cost as a plain
equi-join), no range explosion, no per-key driver loop; skewed keys can be
salted upstream exactly like any other window.  This is the standard
formulation used at 100 TB — a sort-merge within each key partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    tie: str,
    right_cols: Sequence[str],
    prefix: str = "right_",
) -> DataFrame:
    """All left columns + ``prefix<col>`` for each of ``right_cols`` taken
    from the latest right row with the same ``key`` and right ``ts`` <= left
    ``ts``; nulls when no such row exists.

    ``tie`` must be a column unique within (key, ts) on both sides — it makes
    the window order total so results are deterministic even with duplicate
    timestamps."""
    rkeyed = right.select(
        F.col(key),
        F.col(ts),
        F.col(tie),
        *[F.col(c).alias(prefix + c) for c in right_cols],
    )
    l2 = left.select(
        "*",
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(rkeyed.schema[prefix + c].dataType).alias(prefix + c)
            for c in right_cols
        ],
    )
    r2 = rkeyed.select(
        *[
            F.col(c) if c in (key, ts, tie) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("_side"),
        *[F.col(prefix + c) for c in right_cols],
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side", tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry ONE struct of the right payload: per-column last(ignorenulls)
    # would back-fill a legitimately-NULL value in the latest right row from
    # an OLDER row, fabricating a row that never existed (review finding)
    payload = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(prefix + c).alias(c) for c in right_cols]),
    )
    carried = u.select(
        "*", F.last(payload, ignorenulls=True).over(w).alias("_asof")
    )
    return carried.where(F.col("_side") == 1).select(
        *left.columns,
        *[F.col("_asof." + c).alias(prefix + c) for c in right_cols],
    )
