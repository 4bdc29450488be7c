"""Bigram language-model quality scoring (CCNet-style perplexity filtering).

CCNet (Wenzek et al. 2019) filters web text by the perplexity of a KenLM
n-gram model trained on a trusted corpus; stupid backoff (Brants et al.
2007) is the standard smoothing at web scale because it needs no
discounting statistics.  This module reproduces that shape with a bigram
model in exact integer arithmetic so the DuckDB oracle replays every step:

- TRAIN on the deterministic half-split ``doc_id % 2 = 0`` (the "trusted"
  corpus stand-in) -> unigram counts, bigram counts, total token count.
- SCORE every document: each bigram occurrence (prev, cur) gets an integer
  probability in ppm:
      seen:    p_ppm = (bi_cnt * 1_000_000) DIV uni_cnt(prev)
      unseen:  p_ppm = (4 * ((uni_cnt(cur) * 1_000_000) DIV total)) DIV 10
  (stupid backoff with alpha = 0.4 = 4/10 kept integer; an unseen *unigram*
  backs off to 0).  The document score is the integer mean
  ``sum(p_ppm) DIV n_bigrams`` — a monotone proxy for log-likelihood that
  stays exactly replayable (no floats, no logs).

Scale shape (100 TB): model training is two map-side-combined shuffles
(unigrams, bigrams).  Scoring aggregates occurrences per (doc, prev, cur)
first — doc_id in the key keeps that shuffle uniform — then joins the count
tables on word keys.  Word keys are Zipf-skewed, but the model side carries
exactly one row per key, so AQE's skew-join split handles the fact side;
at trillion-token scale the model tables would additionally be df-pruned
(min-count threshold) before the join, which only moves rare grams into the
backoff branch they already price correctly.  No collect, no Python UDFs —
the whole operator is JVM codegen + joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from open_parse_spark.functions import text as T

PPM = 1_000_000
# Stupid-backoff alpha = 0.4 as an integer ratio.
BACKOFF_NUM = 4
BACKOFF_DEN = 10


def _word_pairs(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """All adjacent word pairs per doc, in-order, as (id, prev, cur) rows.

    Reuses the zip_with 2-gram builder (evaluates the word regex once per
    row — see functions/text.py:word_ngrams_all) and splits on the single
    space, which is unambiguous because words match [A-Za-z0-9]+.
    """
    grams = docs.select(
        F.col(id_col),
        F.explode(T.word_ngrams_all(F.col(text_col), 2)).alias("gram"),
    )
    parts = F.split(F.col("gram"), " ")
    return grams.select(
        id_col,
        parts.getItem(0).alias("prev"),
        parts.getItem(1).alias("cur"),
    )


def train_bigram_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_mod: int = 2,
    train_rem: int = 0,
):
    """Unigram/bigram count tables + 1-row total from the train half-split.

    Returns (uni, bi, total): uni = (word, uni_cnt), bi = (prev, cur,
    bi_cnt), total = single-row (total) — kept as a DataFrame so the caller
    broadcast-joins it instead of collecting.
    """
    train = docs.where(F.col(id_col) % train_mod == train_rem)
    uni = (
        train.select(F.explode(T.words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("uni_cnt"))
    )
    bi = (
        _word_pairs(train, text_col, id_col)
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("bi_cnt"))
    )
    total = uni.agg(F.coalesce(F.sum("uni_cnt"), F.lit(0)).alias("total"))
    return uni, bi, total


def lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_mod: int = 2,
    train_rem: int = 0,
    cutoffs: str = "histogram",
) -> DataFrame:
    """Score every document with the half-split bigram model and bucket it
    CCNet-style into head/middle/tail perplexity terciles (CCNet keeps the
    head/middle and drops the tail).

    Output: (doc_id, n_bigrams, oov_bigrams, lm_score_ppm, bucket, keep).
    Docs with < 2 words score 0 ppm; their BUCKET follows the mode's tie
    rule like any other tie group (in window mode, row_number splits a tie
    group across buckets by doc_id, so 0-score docs can land in head when
    more than a third of the corpus ties at 0 — filter on lm_score_ppm > 0
    as well as keep if contentless docs must never survive).

    ``cutoffs`` picks the bucketing strategy:

    - ``"histogram"`` (default — the scale path): scores are integers in
      [0, 1e6] ppm, so ``groupBy(score).count()`` is <= 1,000,001 rows
      REGARDLESS of corpus size; the histogram is folded (lazily, fully
      JVM-side) into two cutoff VALUES that are broadcast back for a
      map-only comparison — one map-side-combined shuffle of bounded
      width, no global sort, no unpartitioned window anywhere in the
      plan (pinned by ``tests/test_plan_shapes.py``).  Under ties it
      differs from "window" by design: equal scores always land in the
      same bucket (CCNet buckets by score value), so bucket sizes are
      terciles up to tie mass.  ``tests/test_lm_quality.py`` pins
      histogram == window wherever the cutoff scores are untied.
    - ``"window"`` (the exact rank-tercile oracle semantics): integer rank
      arithmetic — ``row_number`` over (score desc, doc_id) with
      ``3*rank <= n`` / ``<= 2n`` cutoffs, deterministic under ties.  The
      rank window is a GLOBAL sort (single-partition exchange) — exact at
      test scale, wrong shape at 100 TB; it exists for the DuckDB oracle
      twin (``q_quality_lm``) and tie-sensitive tests, not for production.
    """
    from pyspark.sql.window import Window
    uni, bi, total = train_bigram_counts(
        docs, text_col, id_col, train_mod, train_rem
    )

    occ = (
        _word_pairs(docs, text_col, id_col)
        .groupBy(id_col, "prev", "cur")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    uni_prev = uni.select(
        F.col("word").alias("prev"), F.col("uni_cnt").alias("uni_prev")
    )
    uni_cur = uni.select(
        F.col("word").alias("cur"), F.col("uni_cnt").alias("uni_cur")
    )
    scored = (
        occ.join(bi, ["prev", "cur"], "left")
        .join(uni_prev, "prev", "left")
        .join(uni_cur, "cur", "left")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "p_ppm",
            F.when(
                F.col("bi_cnt").isNotNull(),
                F.expr(f"(bi_cnt * {PPM}L) DIV uni_prev"),
            ).otherwise(
                # total = 0 (empty train split) -> NULL, not an ANSI
                # DIVIDE_BY_ZERO: sum() then skips every p_ppm and the doc
                # score coalesces to 0, exactly the oracle's NULL-fold
                F.expr(
                    f"CASE WHEN total = 0 THEN NULL ELSE"
                    f" ({BACKOFF_NUM} * ((coalesce(uni_cur, 0L) * {PPM}L)"
                    f" DIV total)) DIV {BACKOFF_DEN} END"
                )
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("occ").alias("n_bigrams"),
        F.sum(F.when(F.col("bi_cnt").isNull(), F.col("occ")).otherwise(F.lit(0))).alias(
            "oov_bigrams"
        ),
        F.sum(F.col("p_ppm") * F.col("occ")).alias("p_sum"),
    )
    scored_docs = (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("oov_bigrams"), F.lit(0))
            .cast("long")
            .alias("oov_bigrams"),
            F.coalesce(
                F.expr("p_sum DIV n_bigrams"), F.lit(0)
            )
            .cast("long")
            .alias("lm_score_ppm"),
        )
    )
    if cutoffs == "histogram":
        return _bucket_by_histogram(scored_docs)
    if cutoffs != "window":
        raise ValueError(f"cutoffs must be 'window' or 'histogram', got {cutoffs!r}")
    w = Window.orderBy(F.desc("lm_score_ppm"), F.asc(id_col))
    return (
        scored_docs.withColumn("rank", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(Window.partitionBy()))
        .withColumn(
            "bucket",
            F.when(3 * F.col("rank") <= F.col("n_docs"), F.lit("head"))
            .when(3 * F.col("rank") <= 2 * F.col("n_docs"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .withColumn("keep", F.col("bucket") != F.lit("tail"))
        .drop("rank", "n_docs")
    )


def _bucket_by_histogram(scored_docs: DataFrame) -> DataFrame:
    """Tercile bucketing via the bounded integer-score histogram — LAZY.

    The window form puts ranks 1..floor(n/3) in head and up to floor(2n/3)
    in middle; with untied scores that equals ``score > c1 -> head`` /
    ``score > c2 -> middle`` where c1/c2 are the scores AT descending ranks
    floor(n/3)+1 and floor(2n/3)+1.  The histogram (<= 1e6+1 rows — bounded
    by the score DOMAIN, not the corpus) is sorted descending into ONE
    array row and folded with a higher-order ``aggregate`` into the two
    cutoff values, which broadcast back onto the scored docs.  No collect,
    no persist, no Window node: the whole thing is one lazy plan, and the
    scoring subtree's shuffles are computed once via Spark's ReuseExchange
    (the histogram branch and the output branch share them).  A tie group
    straddling a cutoff lands whole in the worse bucket (CCNet buckets by
    score value).  Empty input returns empty (cutoffs fold to NULL and
    ``score > NULL`` is never true, so the bucket expression is total).
    """
    hist = scored_docs.groupBy("lm_score_ppm").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cuts = (
        hist.agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("lm_score_ppm").alias("s"), F.col("cnt"))
                ),
                asc=False,
            ).alias("h")
        )
        .withColumn("n", F.expr("aggregate(h, 0L, (a, x) -> a + x.cnt)"))
        .select(
            F.expr(
                """
                aggregate(
                  h,
                  named_struct('cum', 0L,
                               'c1', CAST(NULL AS BIGINT),
                               'c2', CAST(NULL AS BIGINT)),
                  (acc, x) -> named_struct(
                    'cum', acc.cum + x.cnt,
                    'c1', CASE WHEN acc.c1 IS NULL
                                AND acc.cum + x.cnt >= n DIV 3 + 1
                               THEN x.s ELSE acc.c1 END,
                    'c2', CASE WHEN acc.c2 IS NULL
                                AND acc.cum + x.cnt >= (2 * n) DIV 3 + 1
                               THEN x.s ELSE acc.c2 END)
                ) AS cuts
                """
            )
        )
        .select(F.col("cuts.c1").alias("_lm_c1"), F.col("cuts.c2").alias("_lm_c2"))
    )
    bucket = (
        F.when(F.col("lm_score_ppm") > F.col("_lm_c1"), F.lit("head"))
        .when(F.col("lm_score_ppm") > F.col("_lm_c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored_docs.crossJoin(F.broadcast(cuts))
        .withColumn("bucket", bucket)
        .withColumn("keep", F.col("bucket") != F.lit("tail"))
        .drop("_lm_c1", "_lm_c2")
    )
