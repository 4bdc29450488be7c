"""Sequence packing: greedy first-fit of documents into fixed-size context
windows, the final assembly step of an LLM training-data pipeline.

Packing is inherently sequential *within* a shard (each doc's bin depends on
everything before it) and embarrassingly parallel *across* shards — the same
shape as the per-turn parse, so the same Spark design applies: group by the
shard key, run the sequential fold inside an Arrow-batched
``applyInPandas``, never on the driver.  At 100 TB the shard key is whatever
bounded unit the pipeline packs within (source, date bucket, …); shards are
hash-distributed, and the only shuffle is the groupBy on the shard key.

The fold itself is deterministic (docs ordered by id within a shard), so a
SQL oracle can replay it with a recursive CTE — the registry entry
``pack_sequences`` is value-checked against exactly that.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_parse_spark.functions.text import word_count

_OUT_SCHEMA = (
    "doc_id long, shard string, n_words long, bin_id long, bin_fill long"
)


def _pack_shard(capacity: int):
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="stable").reset_index(drop=True)
        bins, fills = [], []
        bin_id, fill = 0, 0
        first = True
        for w in pdf["n_words"]:
            w = int(w)
            if first:
                bin_id, fill, first = 0, w, False
            elif fill + w <= capacity:
                fill += w
            else:
                bin_id += 1
                fill = w
            bins.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf[["doc_id", "shard", "n_words", "bin_id", "bin_fill"]]

    return pack


def pack_sequences(
    df: DataFrame,
    capacity: int = 512,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy first-fit packing of docs (ordered by id) into bins of at most
    ``capacity`` words per shard.  A doc larger than ``capacity`` gets a bin
    of its own (overfull, never split).  Returns
    (doc_id, shard, n_words, bin_id, bin_fill) where bin_fill is the running
    fill after placing the doc — the invariant checked by the oracle.

    Word counts are computed JVM-side before the shuffle so the Python stage
    folds plain int64 columns (no strings cross into Python)."""
    sized = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        # _OUT_SCHEMA pins shard as string; cast so a non-string shard
        # column (int date bucket, …) can't reach the Arrow stage with a
        # mismatched schema.
        F.col(shard_col).cast("string").alias("shard"),
        # NULL text counts as 0 words (size(NULL) is NULL in Spark 3+)
        F.coalesce(word_count(F.col(text_col)), F.lit(0)).alias("n_words"),
    )
    return sized.groupBy("shard").applyInPandas(
        _pack_shard(capacity), schema=_OUT_SCHEMA
    )
