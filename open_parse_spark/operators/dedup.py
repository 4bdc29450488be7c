"""Deduplication operators for the large-scale training-data pipeline.

All JVM-side DataFrame ops — no Python UDFs anywhere:

- exact dedup: hash groupBy (md5 of text)
- fingerprint dedup: md5 of normalized text
- n-gram Jaccard near-dup: explode distinct word n-grams -> equi-join on
  gram -> pair counts -> integer-arithmetic Jaccard threshold (no float
  compare, so the DuckDB oracle matches bit-for-bit)
- MinHash + LSH: k hash functions via seeded xxhash64, banded signatures,
  candidate pairs from band-bucket equi-joins (the 100 TB path: no quadratic
  pair enumeration, shuffle is on (band, bucket) keys)
- SimHash: 64-bit sign-of-weighted-bit-sums, candidates from 16-bit bands

Scale notes: every join here is an equi-join on a hashed key (uniform by
construction); hot n-grams are pruned by document frequency (``max_df``)
*identically* in the oracle SQL, which both bounds the shuffle and kills the
quadratic blowup of stop-grams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from open_parse_spark.functions.text import fingerprint, word_ngrams, words
from open_parse_spark.spark.scan import ensure_parallelism
from open_parse_spark.spark.stage import stage


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, dup_count, keep_id).

    Single shuffle on the 128-bit hash — uniform keys, map-side partial agg.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keep_id"),
        )
    )


def fingerprint_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup groups under whitespace/punct/case normalization."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keep_id"),
        )
    )


def _doc_ngrams(
    df: DataFrame, text_col: str, id_col: str, n: int, max_df: int
) -> DataFrame:
    """(id, gram) exploded distinct n-grams, with grams appearing in more
    than ``max_df`` docs pruned (stop-gram pruning; mirrored in the oracle)."""
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    hot = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .where(F.col("df_count") > max_df)
        .select("gram")
    )
    return grams.join(F.broadcast(hot), "gram", "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num: int = 1,
    den: int = 2,
    max_df: int = 50,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate pairs with word-n-gram Jaccard >= num/den.

    Integer-only comparison ``den*inter >= num*union`` keeps the oracle
    bit-exact.  Returns (doc_a, doc_b, inter, uni).

    ``materialize`` localCheckpoints the pruned gram relation: the plan uses
    it four times (self-join both sides, sizes, df-pruning) and Catalyst
    re-computes the regex n-gram expansion per use otherwise (8 scans; 2.7x
    slower measured at sf0.1).  Trade-off: executor-local storage, so an
    executor loss fails the job instead of recomputing — at cluster scale
    either accept job-level retry (batch semantics) or stage the grams to a
    table; pass False for the pure-declarative plan."""
    # the regex n-gram expansion is the CPU wall; a one-row-group scan
    # would serialize it on one task (r6 profile: 2.6 s of a 3.5 s wall)
    grams = _doc_ngrams(
        ensure_parallelism(df, id_col), text_col, id_col, n, max_df
    )
    if materialize:
        grams = stage(grams, eager=False)
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    pairs = (
        grams.alias("a")
        .join(grams.alias("b"), "gram")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("id", "doc_a").alias("sa"), "doc_a")
        .join(
            sizes.withColumnRenamed("id", "doc_b")
            .withColumnRenamed("n_grams", "n_grams_b")
            .alias("sb"),
            "doc_b",
        )
        .withColumn("uni", F.col("n_grams") + F.col("n_grams_b") - F.col("inter"))
        .where(F.lit(den) * F.col("inter") >= F.lit(num) * F.col("uni"))
        .select("doc_a", "doc_b", "inter", "uni")
    )


def _hash_long(col, hasher: str):
    """String -> long hash.  ``xxhash64`` is the scale default (fastest JVM
    hash).  ``md5`` parses the first 15 hex chars (60 bits) to a long — it
    exists so the DuckDB correctness oracle can reproduce the hash exactly
    (``('0x'||substr(md5(x),1,15))::BIGINT``); xxhash64 has no DuckDB
    equivalent.  Both are pure codegen expressions."""
    if hasher == "xxhash64":
        return F.xxhash64(col)
    from open_parse_spark.functions.text import md5_long

    return md5_long(col)


# Carter-Wegman parameters for the md5 path's seeded hash family:
# sig_j(gh) = (A_j * (gh & (2^30-1)) + B_j) mod (2^31-1).  One md5 per gram
# (the base hash), then the 32 seeded hashes are pure integer arithmetic —
# reproducible in ANSI SQL and ~30x cheaper than 32 md5 calls per gram.
# A_j/B_j are fixed odd constants derived from a splitmix64-style sequence.
_CW_MOD = (1 << 31) - 1  # Mersenne prime 2^31-1
_CW_MASK = (1 << 30) - 1


def _cw_params(j: int) -> tuple:
    x = (j + 1) * 0x9E3779B97F4A7C15 % (1 << 64)
    x ^= x >> 30
    x = x * 0xBF58476D1CE4E5B9 % (1 << 64)
    x ^= x >> 27
    a = (x % (_CW_MOD - 1)) + 1  # 1 .. p-1, never 0
    b = (x >> 32) % _CW_MOD
    return a, b


def _seeded_hash_long(j: int, col, hasher: str):
    """(seed j, long col) -> long.  md5 path uses a Carter-Wegman affine
    family over the md5 base hash so the oracle can mirror it with plain
    integer arithmetic (no per-seed md5)."""
    if hasher == "xxhash64":
        return F.xxhash64(F.lit(j), col)
    a, b = _cw_params(j)
    return (F.lit(a) * col.bitwiseAND(F.lit(_CW_MASK)) + F.lit(b)) % F.lit(_CW_MOD)


def doc_gram_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(id, grams: array<long>) — distinct word-n-gram hash values per
    doc, built entirely JVM-side (no explode, no shuffle)."""
    return ensure_parallelism(df, id_col).select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(
                word_ngrams(F.col(text_col), n), lambda g: _hash_long(g, hasher)
            )
        ).alias("grams"),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    hasher: str = "xxhash64",
    grams_df: DataFrame = None,
) -> DataFrame:
    """MinHash signatures: sig_j = min over n-grams of hash(j, gram_hash).

    Computed as ``array_min(transform(grams, ...))`` over the per-doc gram
    array — zero shuffles, one scan, everything inside whole-stage codegen.

    NOTE the seed must be bound via a closure factory producing a
    SINGLE-parameter lambda: ``F.transform`` treats a two-parameter lambda as
    ``(element, index)``, so the round-1 ``lambda g, j=j`` had its seed
    silently shadowed by the array index — every signature came out
    identical per doc (degenerate LSH).  Caught by the DuckDB oracle.

    ``grams_df`` lets callers pass a precomputed (id, grams) relation so the
    gram hashing is shared with other consumers (see minhash_neardup_pairs)."""
    grams = (
        grams_df
        if grams_df is not None
        else doc_gram_hashes(df, text_col, id_col, n, hasher)
    )

    # (r6 note: a vectorized-numpy Carter-Wegman variant of the md5 path
    # was A/B'd and rejected — 0.42 s vs 0.52 s warm but 2.9 s vs 0.9 s on
    # the first run, and the suite's run-once pattern pays first-run cost.)
    def _sig(j: int):
        return lambda g: _seeded_hash_long(j, g, hasher)

    sig_cols = [
        F.array_min(F.transform(F.col("grams"), _sig(j))).alias(f"sig_{j}")
        for j in range(num_hashes)
    ]
    return grams.where(F.size("grams") > 0).select("id", *sig_cols)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    hasher: str = "xxhash64",
    grams_df: DataFrame = None,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band bucket.

    The scale path for near-dup at 100 TB: pair enumeration is bounded by
    bucket sizes, shuffle keys are (band, bucket_hash) — uniform.  8 bands x 4 rows:
    measured recall 1.0 vs exact Jaccard on the synthetic corpus; raise
    ``bands`` (e.g. 16x2, catch p=0.99 at J=0.5) when the corpus has many
    borderline-similarity pairs - more candidates, same verification."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes, hasher, grams_df)

    def _band_bucket(b: int):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        if hasher == "xxhash64":
            return F.xxhash64(*cols)
        # md5 path: polynomial fold of the signature slice (sigs < 2^31, so
        # ((s0*31+s1)*31+s2)*31+s3 < 2^46 — exact in BIGINT on both engines)
        acc = cols[0]
        for c in cols[1:]:
            acc = acc * F.lit(31) + c
        return acc

    band_cols = [_band_bucket(b).alias(f"band_{b}") for b in range(bands)]
    banded = sigs.select("id", *band_cols)
    buckets = banded.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )


def minhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num: int = 1,
    den: int = 2,
    max_df: int = 50,
    hasher: str = "xxhash64",
    materialize: bool = True,
) -> DataFrame:
    """MinHash-LSH candidates verified candidate-locally by exact n-gram
    Jaccard.

    The scale path end-to-end: LSH bounds the pair enumeration; verification
    joins only the candidate pairs against per-doc gram-hash arrays and
    computes exact intersection/union via ``array_intersect`` — no quadratic
    stage anywhere.  Gram hashing (xxhash64 default) makes the arrays
    fixed-width longs instead of strings (cheap to shuffle/compare); the
    2^-64 collision rate is negligible at any corpus size.  ``hasher='md5'``
    swaps in the oracle-reproducible 60-bit md5 hash (same algorithm, ~2x
    hash cost) so the whole banded-LSH path is value-checkable in DuckDB.

    ``materialize`` localCheckpoints the per-doc gram-hash arrays so the
    signature path and the verification path share ONE gram computation
    (otherwise Catalyst re-derives the regex n-gram expansion per consumer —
    6 scans; see ngram_jaccard_pairs for the trade-off)."""
    ghs = doc_gram_hashes(df, text_col, id_col, n, hasher)
    if materialize:
        ghs = stage(ghs, eager=False)
    cands = minhash_lsh_candidates(df, text_col, id_col, n, hasher=hasher, grams_df=ghs)
    # df-pruning for verification: drop grams with df > max_df, mirroring
    # ngram_jaccard_pairs (and its oracle) exactly
    exploded = ghs.select("id", F.explode("grams").alias("gh"))
    hot_grams = (
        exploded.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .where(F.col("df_count") > max_df)
        .select("gh")
    )
    gram_sets = (
        exploded.join(F.broadcast(hot_grams), "gh", "left_anti")
        .groupBy("id")
        .agg(F.collect_set("gh").alias("grams"))
    )
    ga = gram_sets.withColumnRenamed("id", "doc_a").withColumnRenamed("grams", "ga")
    gb = gram_sets.withColumnRenamed("id", "doc_b").withColumnRenamed("grams", "gb")
    verified = (
        cands.join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("ga", "gb")).cast("long"))
        .withColumn(
            "uni", (F.size("ga") + F.size("gb")).cast("long") - F.col("inter")
        )
        .where(F.lit(den) * F.col("inter") >= F.lit(num) * F.col("uni"))
    )
    return verified.select("doc_a", "doc_b", "inter", "uni")


def connected_components(
    pairs: DataFrame, max_iters: int = 20
) -> DataFrame:
    """Duplicate-cluster assignment from near-dup pairs: (id, component)
    where component = min doc id reachable through the pair graph.

    Alternating min-label propagation over the edge list (the standard
    large-scale CC formulation — each iteration is one groupBy shuffle on
    uniform ids; converges in O(log n) iterations for near-dup graphs, which
    are unions of small cliques, typically 1-3).  Driver only checks a
    convergence count per iteration — no per-row collect."""
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        # materialize once: every propagation iteration joins against edges,
        # and without this the upstream pair generation (e.g. the jaccard
        # gram self-join) re-runs per iteration
        .transform(stage)
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        # checkpoint BEFORE the convergence count: the count then reads the
        # materialized iteration instead of re-deriving the whole lineage
        # (checkpoint-then-count halves per-iteration work vs count-then-
        # checkpoint, which materialized every iteration twice)
        new_labels = stage(new_labels)  # truncate lineage
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), "component")


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per training doc, how many of its distinct
    word n-grams appear anywhere in the benchmark set (the standard
    eval-contamination check run before training).

    Scale shape: the benchmark side is tiny relative to the corpus, so its
    distinct grams are broadcast — the training corpus is scanned once,
    map-side joined, and aggregated on ``id`` with partial aggregation; no
    corpus-side shuffle on gram.  Returns every training doc with
    (shared_grams, contaminated)."""
    train_grams = ensure_parallelism(train, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    bench_grams = (
        benchmark.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    shared = (
        train_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    return (
        train.select(F.col(id_col).alias("doc_id"))
        .join(shared.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("shared_grams"), F.lit(0)).alias("shared_grams"),
            (F.coalesce(F.col("shared_grams"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def cluster_representatives(
    df: DataFrame,
    pairs: DataFrame,
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pick one representative per near-dup cluster: highest ``quality_col``,
    ties broken by lowest id (docs outside any cluster represent themselves).

    One extra shuffle on component after connected components; the per-
    component window is safe at scale because near-dup components are small
    cliques (bounded by the LSH/jaccard candidate generation)."""
    from pyspark.sql.window import Window

    comps = connected_components(pairs)
    labeled = (
        df.select(F.col(id_col).alias("doc_id"), F.col(quality_col).alias("q"))
        .join(comps, "doc_id", "left")
        .withColumn("component", F.coalesce(F.col("component"), F.col("doc_id")))
    )
    w = Window.partitionBy("component").orderBy(F.desc("q"), F.asc("doc_id"))
    return labeled.select(
        "doc_id",
        "component",
        (F.row_number().over(w) == 1).alias("is_rep"),
    )


def dedup_keep_list(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Final dedup decision: every doc keeps=false iff it is in a near-dup
    component and is not the component's min id."""
    comps = connected_components(pairs)
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(comps, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("component").isNull()
                | (F.col("component") == F.col("doc_id"))
            ).alias("keep"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 16,
    hasher: str = "md5",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
    every character k-gram, then keep the minimum hash of each ``window``
    consecutive k-grams — any shared substring of length >= k + window - 1
    is guaranteed to contribute at least one common fingerprint, with the
    stored set ~1/window the size of the full k-gram set.

    Returns (id, fp) — one row per distinct fingerprint per doc; near-dup
    candidates are then an equi-join on fp (same shape as the gram join).

    All JVM-side: one projection builds the k-gram hash array, a second
    takes windowed minima (``slice``+``array_min`` per position — O(n*w)
    expression work; an O(n) monotonic-deque variant needs imperative code
    and isn't worth leaving codegen for at w=16).  ``hasher='md5'`` default
    because the DuckDB oracle mirrors it exactly; pass 'xxhash64' for the
    cheaper scale hash."""
    # filter on text length, not size(kh): a size(kh) predicate gets pushed
    # into the scan and re-evaluates the whole k-gram transform per row in
    # the filter (doubling the hash work); length >= k+w-1 is equivalent
    khashes = ensure_parallelism(df, id_col).where(
        F.length(text_col) >= k + window - 1
    ).select(
        F.col(id_col).alias("id"),
        F.transform(
            F.sequence(F.lit(1), F.length(text_col) - (k - 1)),
            lambda i: _hash_long(F.col(text_col).substr(i, F.lit(k)), hasher),
        ).alias("kh"),
    )
    fps = khashes.select(
        "id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("kh") - (window - 1)),
                    lambda i: F.array_min(F.slice(F.col("kh"), i, window)),
                )
            )
        ).alias("fp"),
    )
    return fps


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: str = "xxhash64",
) -> DataFrame:
    """SimHash over words: bit_i = sign(sum over words of
    (+1 if hash(word) bit_i else -1)).

    64 bits with the xxhash64 default; 60 bits with ``hasher='md5'`` (the
    oracle-reproducible 15-hex-char parse — 60 bits keeps the value inside a
    signed BIGINT on both engines).

    r6 shape: the per-word hashes stay JVM expressions (codegen md5/xxhash64,
    exactly what the oracle replays), but the bit fold is one vectorized
    Arrow pass over the per-doc hash arrays — MAP-ONLY, replacing the word
    explode + 60-column groupBy shuffle (which was also the whole query's
    CPU wall: 60 interpreted sum-branches per exploded word).  Integer-only
    numpy (+1/-1 counts, disjoint bit weights) is bit-identical to the JVM
    fold on any partitioning; docs with zero words drop out exactly as the
    explode+groupBy dropped them."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType

    n_bits = 64 if hasher == "xxhash64" else 60

    def _fold(hs_series):
        out = np.zeros(len(hs_series), dtype=np.uint64)
        arrs = hs_series.values
        flat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in arrs if len(a)]
        ) if any(len(a) for a in arrs) else np.empty(0, dtype=np.int64)
        if len(flat):
            lens = np.array([len(a) for a in arrs], dtype=np.int64)
            # (n_words, n_bits) +1/-1, reduced per doc, sign -> bit
            bits = ((flat[:, None] >> np.arange(n_bits, dtype=np.int64)) & 1)
            contrib = bits * 2 - 1  # +1 / -1
            starts = np.zeros(len(arrs), dtype=np.int64)
            starts[1:] = np.cumsum(lens)[:-1]
            nz = lens > 0
            sums = np.zeros((len(arrs), n_bits), dtype=np.int64)
            if nz.any():
                red = np.add.reduceat(contrib, starts[nz], axis=0)
                # reduceat with repeated starts (zero-length segments) is
                # avoided by indexing only non-empty docs
                sums[nz] = red
            weights = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))
            out = ((sums > 0).astype(np.uint64) * weights).sum(
                axis=1, dtype=np.uint64
            )
        return pd.Series(out.astype(np.uint64).view(np.int64))

    fold = F.pandas_udf(_fold, LongType())
    # "has at least one word" as a cheap scan-level predicate: words() is
    # regexp_extract_all('[A-Za-z0-9]+'), so rlike('[A-Za-z0-9]') is exactly
    # size(words(text)) > 0 — filtering on size(hs) instead put the ENTIRE
    # hash transform inside the pushed-down filter below the exchange
    # (evaluated twice, once on the unparallelized scan; r6 plan finding)
    hs = ensure_parallelism(
        df.where(F.col(text_col).rlike("[A-Za-z0-9]")), id_col
    ).select(
        F.col(id_col).alias("id"),
        F.transform(
            words(F.col(text_col)), lambda w: _hash_long(w, hasher)
        ).alias("hs"),
    )
    return hs.select("id", fold(F.col("hs")).alias("simhash"))


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: str = "xxhash64",
) -> DataFrame:
    """Near-dup candidates: equal band of the simhash (4 bands of 16 bits for
    the 64-bit default, 4 x 15 bits for the 60-bit md5 variant; <= 3-bit
    global difference guaranteed caught in at least one band)."""
    band_bits = 16 if hasher == "xxhash64" else 15
    mask = (1 << band_bits) - 1
    # the banded self-join consumes the simhash relation on BOTH sides; one
    # materialization computes the word-explode + per-word hash + 60-bit
    # fold once instead of per consumer (the broadcast build side cannot
    # reuse the other side's exchange)
    s = stage(simhash(df, text_col, id_col, hasher), eager=False)
    bands = s.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), band_bits * b)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    return (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 3,
    min_chars: int = 5,
) -> DataFrame:
    """Corpus-level boilerplate removal: drop LINES repeated across many
    documents (CCNet / RefinedWeb line-level dedup — nav text, copyright
    footers, cookie banners survive per-document extraction but repeat
    across the corpus).

    A line is boilerplate when its space-trimmed form has >= ``min_chars``
    chars and appears in >= ``min_df`` distinct documents.  Shorter lines
    (incl. empty spacer lines) are never dropped — they carry structure,
    not boilerplate.  Output keeps every input document: ``(doc_id,
    clean_text, n_lines_kept, n_lines_dropped)``, line order preserved.

    Scale shape: explode -> two-level aggregate on the trimmed line (map-
    side partial) -> join back -> per-doc reassembly.  Two shuffles (line
    df + doc regroup); the flagged-line relation is naturally small (only
    lines repeated across >= min_df docs) so AQE broadcasts the anti-join
    side at runtime — no driver-side collection at any size.  Assumes
    ``id_col`` uniquely identifies a row (a document table), as reassembly
    by (doc, pos) requires.
    """
    lines = ensure_parallelism(df, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    ).withColumn("nline", F.trim(F.col("line")))
    flagged = (
        lines.where(F.length("nline") >= min_chars)
        .groupBy("nline")
        .agg(F.countDistinct("doc_id").alias("line_df"))
        .where(F.col("line_df") >= min_df)
        .select("nline")
    )
    kept = lines.join(flagged, "nline", "left_anti")
    # per-doc line totals straight off the source column — counting via the
    # exploded relation would re-scan and re-explode the corpus a third time
    totals = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("n_total"),
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines_kept", F.lit(0))
            .cast("long")
            .alias("n_lines_kept"),
            (F.col("n_total") - F.coalesce("n_lines_kept", F.lit(0)))
            .cast("long")
            .alias("n_lines_dropped"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    n: int = 6,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplication spans (the word-gram variant of Lee et
    al. 2022's suffix-array dedup): every position whose n-gram occurs in
    >= ``min_df`` DISTINCT documents is flagged, and flagged positions
    whose word ranges overlap merge into maximal non-overlapping spans via
    a gaps-and-islands window (gap > n-1 starts a new span).
    Returns (doc_id, span_start, span_end, n_dup_grams) — span bounds are
    0-based word indices, inclusive.

    100 TB plan: positional grams are map-only (zip_with chain, no HOF
    capture re-evaluation); gram document-frequency is one shuffle with
    map-side combine; the flag join shuffles on the gram key (AQE handles
    the skewed hot grams); the island window is one shuffle on doc_id.
    Nothing is quadratic — unlike a literal suffix array, which needs
    corpus-order sorting of every suffix."""
    from pyspark.sql.window import Window

    from open_parse_spark.functions.text import word_ngrams_all

    grams = ensure_parallelism(df, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_ngrams_all(F.col(text_col), n)).alias("pos", "gram"),
    )
    # the two consumers (df aggregate + flag join) re-run the explode above
    # the ensure_parallelism exchange (shuffle files are reused, the
    # projection is not).  r5 measured a localCheckpoint win here, but that
    # was against a SINGLE-TASK expansion; with the parallel scan the
    # recompute is cheaper than writing/reading the exploded relation
    # (r6 A/B: 0.84 s recompute vs 1.15 s materialized at sf0.1/32c) —
    # and at corpus scale re-scanning compressed columnar input beats
    # round-tripping the ~5x-larger gram relation through local disk.
    dfreq = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= min_df)
        .select("gram")
    )
    dup = grams.join(dfreq, "gram").select("doc_id", "pos")
    # islands merge whenever the WORD RANGES [pos, pos+n-1] overlap, not
    # only when positions are adjacent: flagged positions p and p+2 with an
    # unflagged p+1 still describe one duplicated region, and the naive
    # pos - row_number() islanding emitted two OVERLAPPING spans — a
    # consumer summing span widths then double-counts words (review
    # finding).  A new island starts when the gap from the previous flagged
    # position exceeds n-1 (first row: NULL condition -> otherwise -> 1).
    w = Window.partitionBy("doc_id").orderBy("pos")
    new_island = (
        F.when(F.col("pos") - F.lag("pos").over(w) <= n - 1, F.lit(0))
        .otherwise(F.lit(1))
    )
    islands = dup.withColumn(
        "isl",
        F.sum(new_island).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy("doc_id", "isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (n - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_dup_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_dup_grams")
    )


def _validate_bloom_m(m: int) -> None:
    if m & (m - 1) or m <= 0:
        raise ValueError(f"m must be a power of two, got {m}")


def bloom_positions(df_grams: DataFrame, m: int, k: int) -> DataFrame:
    """Explode a `gram` column into its k Bloom bit positions (column
    `pos`).  h is materialized in its own projection so md5 evaluates once
    per gram, not k times; power-of-two m -> mask/shift instead of %/div
    (float division would round the 60-bit hash past the double mantissa
    and diverge from the oracle's exact integer replay).  MUST stay in
    lockstep with :func:`bloom_positions_py` (dialect-parity pytest)."""
    _validate_bloom_m(m)
    bits = m.bit_length() - 1
    from open_parse_spark.functions.text import md5_long

    h = df_grams.withColumn("h", md5_long(F.col("gram")))
    h1 = F.col("h").bitwiseAND(m - 1)
    h2p = F.shiftright(F.col("h"), bits).bitwiseAND(m - 1)
    h2 = h2p.bitwiseOR(1)  # odd stride -> cycles all m positions
    return h.withColumn(
        "pos",
        F.explode(F.array(*[(h1 + i * h2).bitwiseAND(m - 1) for i in range(k)])),
    )


def bloom_positions_py(gram: str, m: int, k: int) -> list:
    """Pure-Python twin of :func:`bloom_positions` for stream-side
    membership checks (same md5-hex-prefix hash, same mask/shift/odd-stride
    arithmetic)."""
    import hashlib

    bits = m.bit_length() - 1
    h = int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16)
    h1 = h & (m - 1)
    h2 = ((h >> bits) & (m - 1)) | 1
    return [(h1 + i * h2) & (m - 1) for i in range(k)]


def bloom_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    m: int = 1 << 20,
    k: int = 4,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-filter benchmark decontamination — the constant-memory scale
    path for :func:`ngram_contamination`.

    ``ngram_contamination`` broadcasts the benchmark's distinct gram
    STRINGS; at a large benchmark suite that broadcast grows with text
    size.  Here the benchmark is compressed to a classic Bloom filter of
    ``m`` bits with ``k`` double-hashed probes (Kirsch-Mitzenmacher: two
    base hashes derived from ONE md5, position_i = (h1 + i*h2) mod m), and
    only the distinct SET-BIT positions — at most ``min(k * |grams|, m)``
    longs, bounded by ``m`` regardless of benchmark size — are broadcast.
    A training gram is flagged iff all ``k`` of its positions are set:
    every truly-shared gram is flagged (no false negatives), and position
    collisions add a tunable false-positive rate (~(1-e^(-kn/m))^k).

    The whole chain is integer arithmetic over the oracle-reproducible
    60-bit md5 hash, so a SQL engine replays EXACT output bits — false
    positives included.

    100 TB plan: benchmark side is one tiny aggregation; the corpus is
    scanned once, map-only gram+position expansion, broadcast-hash-joined
    against the bit table (no corpus-side shuffle on gram), then one
    partial-aggregated shuffle on (doc, gram) and one on doc.

    Returns (doc_id, n_grams, bloom_hits, bloom_contaminated) for every
    training doc.
    """
    _validate_bloom_m(m)

    # the benchmark side pays gram explode + per-gram md5 + two distincts;
    # parallelize its scan too (r6 profile: 2 s single-task bench_bits job).
    # Keyless (round-robin): the benchmark contract only requires text_col
    # — it need not carry the id column.
    bench_bits = (
        bloom_positions(
            ensure_parallelism(benchmark.select(text_col)).select(
                F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
            ).distinct(),
            m,
            k,
        )
        .select("pos")
        .distinct()
    )

    grams = ensure_parallelism(train, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    # two consumers (per-doc totals + the probe join) must not re-expand
    # the regex n-grams — same trap duplicate_spans documents
    grams = stage(grams, eager=False)

    totals = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        bloom_positions(grams, m, k)
        .join(F.broadcast(bench_bits), "pos")
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("set_probes"))
        .where(F.col("set_probes") == k)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("bloom_hits"))
    )
    return (
        train.select(F.col(id_col).alias("doc_id"))
        .join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("bloom_hits", F.lit(0)).cast("long").alias("bloom_hits"),
            (F.coalesce("bloom_hits", F.lit(0)) > 0).alias("bloom_contaminated"),
        )
    )
