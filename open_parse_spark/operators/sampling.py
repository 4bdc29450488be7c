"""Deterministic sampling operators for training-data curation.

Stratified sampling keeps an exact per-stratum quota chosen by a content
hash — reproducible across runs and engines (md5 hex ordering is identical
in Spark and DuckDB, so the registry oracle replays the exact selection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stratified_sample(
    df: DataFrame,
    num: int = 1,
    den: int = 5,
    stratum_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep exactly ``ceil(num/den * n)`` docs per stratum, selected by
    smallest md5 of (id ':' text) — deterministic, uniform within stratum,
    and engine-portable (pure integer quota arithmetic, hex-string order).

    Scale shape: one shuffle on the stratum key; the per-stratum sort is a
    window over that partition.  For strata too large for one partition at
    100 TB, pre-aggregate per-stratum counts (broadcast back) and select by
    hash threshold instead of row_number — this exact-quota variant is the
    correctness baseline."""
    h = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.col(text_col))
    )
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        F.row_number().over(w).cast("long").alias("sample_rank"),
        F.count(F.lit(1))
        .over(Window.partitionBy(stratum_col))
        .cast("long")
        .alias("stratum_n"),
    )
    # keep rank <= ceil(num*n/den)  ==  den*rank <= num*n rounded up
    quota = F.floor((F.lit(num) * F.col("stratum_n") + F.lit(den - 1)) / F.lit(den))
    return ranked.where(F.col("sample_rank") <= quota).select(
        "doc_id", "stratum", "sample_rank", "stratum_n"
    )
