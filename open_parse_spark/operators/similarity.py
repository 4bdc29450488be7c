"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline.  Queries are broadcast
  (small side), the big side streams — no shuffle of the corpus at all.
  Dot products via ``F.aggregate(F.zip_with(...))``: JVM-side, sequential
  left-to-right double summation (matches the DuckDB oracle's evaluation
  order bit-for-bit).
- LSH-bucketed ANN (random hyperplanes): the 100 TB path — bucket the corpus
  once by sign-pattern, probe only matching buckets.  Hyperplanes are
  deterministic pseudo-random values derived from xxhash64(plane, dim), so
  no RNG state ships to executors and two runs agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast(queries) x corpus -> window
    rank.  Output (query_id, neighbor_id, rank, sim4)."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("sim", 4).alias("sim4"),
        )
    )


def hyperplane(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    (xxhash64(plane, d) mod 2001 - 1000) / 1000."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.pmod(F.xxhash64(F.lit(plane), d), F.lit(2001)) - F.lit(1000)
        ).cast("double")
        / F.lit(1000.0),
    )


def lsh_bucket(vec: Column, num_planes: int, dim: int) -> Column:
    """Sign-pattern bucket id over ``num_planes`` deterministic hyperplanes."""
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        bit = F.when(dot(vec, hyperplane(p, dim)) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only within the query's hyperplane bucket.

    At scale the corpus is bucketed once (write-time or cached); per-query
    work is bucket-local.  Recall trades off with num_planes."""
    from pyspark.sql.window import Window

    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("bucket", lsh_bucket(F.col("cv"), num_planes, dim))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", lsh_bucket(F.col("qv"), num_planes, dim))
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("sim", 4).alias("sim4"),
        )
    )
