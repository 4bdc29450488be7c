"""Product-quantization (PQ) ANN — the third approximate-search family next
to hyperplane-LSH and IVF (``operators/similarity.py``).

PQ splits each vector into ``n_sub`` contiguous subspaces, k-means-trains a
tiny per-subspace codebook, stores each corpus vector as ``n_sub`` small
codes, and scores queries by Asymmetric Distance Computation (ADC): the
query precomputes its exact distance to every codebook centroid, and a
corpus vector's approximate distance is the SUM of table lookups — no
full-dimension arithmetic per pair (Jegou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011).

Everything is exact fixed-point integer arithmetic in the style of
``ivf_topk_quantized``: quantize once, integer Lloyd with one declared
rounding per step, integer squared distances — so a SQL engine replays the
whole train/encode/score chain bit-for-bit.

Design notes (100 TB):

- ALL subspace codebooks train in ONE joint Lloyd over the composite
  (subspace, code) key — per iteration: one broadcast codebook join + one
  map-side-combined aggregation; iterating subspaces sequentially would
  multiply job count by ``n_sub`` for no reason.
- Corpus encoding is a broadcast join + per-(id, subspace) min_by — no
  Python, no window sort.
- ADC scoring broadcasts the query distance tables
  (|queries| x n_sub x n_codes rows); the corpus code table is scanned
  once, map-side joined, and partially aggregated into per-(query,
  neighbor) sums before the final shuffle.
- The memory win at scale: a 64-dim float vector (256 B) becomes
  ``n_sub`` byte-sized codes + one shared codebook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from open_parse_spark.operators.similarity import (
    QUANT_SCALE,
    _dim_of,
    _md5_long,
    int_sqdist,
    quantize_vec,
)
from open_parse_spark.spark.stage import stage


def _subspace_rows(
    df: DataFrame, n_sub: int, sub: int, id_col: str, vec_col: str, scale: int
) -> DataFrame:
    """(id, s, svq): one row per vector per subspace, svq the quantized
    contiguous slice for subspace s (1-indexed)."""
    slices = F.array(
        *[
            F.struct(
                F.lit(s + 1).alias("s"),
                quantize_vec(
                    F.slice(F.col(vec_col), s * sub + 1, sub), scale
                ).alias("svq"),
            )
            for s in range(n_sub)
        ]
    )
    return df.select(
        F.col(id_col).alias("id"), F.explode(slices).alias("z")
    ).select("id", F.col("z.s").alias("s"), F.col("z.svq").alias("svq"))


def _assign_codes(sv: DataFrame, codebook: DataFrame) -> DataFrame:
    """Nearest code per (id, subspace): exact integer L2, ties to the lowest
    code id (the same convention as the IVF quantizer's argmin)."""
    d = int_sqdist(F.col("svq"), F.col("cq")).alias("d")
    return (
        sv.join(F.broadcast(codebook), "s")
        .select("id", "s", "svq", F.col("code"), d)
        .groupBy("id", "s")
        .agg(
            F.min_by("code", F.struct(F.col("d"), F.col("code"))).alias("code"),
            F.first("svq").alias("svq"),
        )
    )


def pq_codebooks_quantized(
    embeddings: DataFrame,
    n_sub: int = 4,
    n_codes: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
    dim: int = None,
) -> DataFrame:
    """Joint fixed-point Lloyd over every subspace at once.

    Init: per subspace, the ``n_codes`` vectors with the smallest md5(id)
    hash (the IVF init convention — identical ids across subspaces, slices
    differ).  Update: per-dim floor(sum/count + 0.5).  Returns
    (s, code, cq: array<bigint>).  ``dim`` skips the probe job when the
    caller already knows it.
    """
    if dim is None:
        dim = _dim_of(embeddings, vec_col)
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sub = dim // n_sub
    sv = stage(
        _subspace_rows(embeddings, n_sub, sub, id_col, vec_col, scale),
        eager=False,
    )
    wh = Window.partitionBy("s").orderBy("h")
    codebook = (
        sv.withColumn("h", _md5_long(F.col("id")))
        .withColumn("rn", F.row_number().over(wh))
        .where(F.col("rn") <= n_codes)
        .select("s", F.col("rn").cast("long").alias("code"), F.col("svq").alias("cq"))
    )
    for _ in range(iters):
        assigned = _assign_codes(sv, codebook)
        codebook = assigned.groupBy("s", "code").agg(
            F.array(
                *[
                    F.floor(
                        F.sum(F.element_at("svq", i + 1)).cast("double")
                        / F.count(F.lit(1))
                        + F.lit(0.5)
                    )
                    .cast("long")
                    .alias(f"d{i}")
                    for i in range(sub)
                ]
            ).alias("cq")
        )
        codebook = stage(codebook)
    return codebook


def pq_topk_quantized(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_sub: int = 4,
    n_codes: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
    dim: int = None,
) -> DataFrame:
    """ADC top-k: returns (query_id, neighbor_id, rank, adist) where adist
    is the exact-integer sum of per-subspace squared distances from the
    query to the neighbor's code centroids (lower = closer); ties break on
    the lower neighbor id.  ``dim`` skips the probe jobs when known."""
    if dim is None:
        dim = _dim_of(embeddings, vec_col)
    if dim == 0 or n_sub <= 0:
        # empty corpus (dim probes to 0): nothing to train or score —
        # return an empty result with the output schema instead of a
        # divide-by-zero (empty partitions are routine at scale)
        return queries.select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0).cast("long").alias("rank"),
            F.lit(0).cast("long").alias("adist"),
        ).where(F.lit(False))
    qdim = _dim_of(queries, vec_col)
    if qdim != dim:
        # a silent mismatch would null-pad int_sqdist's zip_with and rank
        # on NULL adist — garbage top-k with no exception (review finding)
        raise ValueError(f"query dim {qdim} != corpus dim {dim}")
    sub = dim // n_sub
    codebook = pq_codebooks_quantized(
        embeddings, n_sub=n_sub, n_codes=n_codes, iters=iters,
        id_col=id_col, vec_col=vec_col, scale=scale, dim=dim,
    )
    corpus_sv = _subspace_rows(embeddings, n_sub, sub, id_col, vec_col, scale)
    codes = _assign_codes(corpus_sv, codebook).select(
        F.col("id").alias("neighbor_id"), "s", "code"
    )
    qtab = (
        _subspace_rows(queries, n_sub, sub, id_col, vec_col, scale)
        .withColumnRenamed("id", "query_id")
        .join(F.broadcast(codebook), "s")
        .select(
            "query_id", "s", "code",
            int_sqdist(F.col("svq"), F.col("cq")).alias("d"),
        )
    )
    scored = (
        codes.join(F.broadcast(qtab), ["s", "code"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").cast("long").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adist")
    )
