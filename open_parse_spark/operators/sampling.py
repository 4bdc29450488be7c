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


def _h60(h_col):  # md5 hex -> uniform double in [0, 1): first 60 bits
    return (F.conv(F.substring(h_col, 1, 15), 16, 10).cast("double")
            / F.lit(float(1 << 60)))


def stratified_sample_threshold(
    df: DataFrame,
    num: int = 1,
    den: int = 5,
    stratum_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The 100 TB shape of :func:`stratified_sample`: keep docs whose
    60-bit md5 fraction is below num/den — MAP-ONLY (no per-stratum sort,
    no window, no count), so a stratum larger than any partition costs
    nothing extra.  The kept count is Binomial(n, num/den) per stratum
    (±sqrt(n) of quota) instead of exact; `stratified_sample` remains the
    exact-quota correctness baseline and oracle."""
    h = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.col(text_col))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        _h60(h).alias("h60"),
    ).where(F.col("h60") < F.lit(num / den)).select("doc_id", "stratum")


def _sized_with_quota(
    df: DataFrame,
    weights_ppm: "dict[str, int]",
    budget_tokens: int,
    domain_col: str,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Shared first stage of both mixers: broadcast-join the tiny weights
    relation and emit (doc_id, domain, tokens, quota, h) — one source of
    truth so the exact and threshold twins (and their DuckDB oracles) can
    never diverge on the join/hash/quota arithmetic.

    The quota is overflow-free floor(ppm*budget/1e6): the budget splits
    host-side into (q, r) = divmod(budget, 1e6); ppm*q + ppm*r div 1e6 is
    exact and every product fits int64 for ppm <= 1e6 at ANY int64 budget
    (a raw ppm*budget overflows past ~9.2T-token budgets)."""
    from open_parse_spark.functions.text import token_count

    spark = df.sparkSession
    w_df = F.broadcast(
        spark.createDataFrame(
            [(d, int(p)) for d, p in sorted(weights_ppm.items())],
            f"{domain_col} string, weight_ppm long",
        )
    )
    return df.join(w_df, domain_col).select(
        F.col(id_col).alias("doc_id"),
        F.col(domain_col).alias("domain"),
        token_count(F.coalesce(F.col(text_col), F.lit(""))).alias("tokens"),
        F.expr(
            f"weight_ppm * CAST({budget_tokens // 1_000_000} AS BIGINT)"
            f" + (weight_ppm * CAST({budget_tokens % 1_000_000} AS BIGINT))"
            f" div 1000000"
        )
        .cast("long")
        .alias("quota"),
        F.md5(
            F.concat_ws(":", F.col(id_col).cast("string"), F.col(text_col))
        ).alias("h"),
    )


def mix_by_budget(
    df: DataFrame,
    weights_ppm: "dict[str, int]",
    budget_tokens: int,
    domain_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Build a training mixture: cover each domain's token quota
    (``weight_ppm/1e6 * budget_tokens``, integer floor) by taking docs in
    deterministic md5 order, REPEATING the domain for extra epochs when its
    corpus is smaller than its quota (the Pile/DoReMi-style up-sampling of
    scarce domains).

    Per selected doc the output carries one row per epoch:
    ``(doc_id, domain, epoch, tokens, n_epochs)`` — epoch 1..n_epochs, where
    ``n_epochs = full_epochs + (1 if the doc falls in the remainder prefix)``;
    ``full_epochs = quota div domain_tokens`` and the remainder prefix is the
    greedy md5-ordered head whose running sum first covers the leftover
    quota (the crossing doc is included, so the quota is always covered when
    the domain is non-empty).  Domains absent from ``weights_ppm`` — and
    zero-token domains — are excluded; a zero quota selects nothing.

    Scale shape: one broadcast join against the tiny weights relation, one
    shuffle on the domain key (the per-domain running sum and the per-domain
    total ride the same partitioning), then a map-side explode of the
    bounded epochs array.  Nothing is proportional to corpus size on the
    driver; epoch counts are bounded by quota/domain_tokens.
    """
    sized = _sized_with_quota(
        df, weights_ppm, budget_tokens, domain_col, text_col, id_col
    )
    wd = Window.partitionBy("domain")
    wo = wd.orderBy(F.col("h").asc(), F.col("doc_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = sized.select(
        "doc_id",
        "domain",
        "tokens",
        "quota",
        F.sum("tokens").over(wo).alias("cum"),
        F.sum("tokens").over(wd).alias("domain_tokens"),
    ).where(F.col("domain_tokens") > 0)
    full = F.expr("quota div domain_tokens").cast("long")
    remainder = F.col("quota") - full * F.col("domain_tokens")
    n_epochs = (
        full + (F.col("cum") - F.col("tokens") < remainder).cast("long")
    ).alias("n_epochs")
    selected = staged.select(
        "doc_id", "domain", "tokens", n_epochs
    ).where(F.col("n_epochs") >= 1)
    return selected.select(
        "doc_id",
        "domain",
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.col("n_epochs"))
        ).alias("epoch"),
        "tokens",
        "n_epochs",
    )


def mix_by_budget_threshold(
    df: DataFrame,
    weights_ppm: "dict[str, int]",
    budget_tokens: int,
    domain_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The 100 TB shape of :func:`mix_by_budget`: same quotas and full-epoch
    arithmetic, but the remainder prefix is chosen by HASH THRESHOLD instead
    of a per-domain running-sum window — docs whose 60-bit md5 fraction is
    below remainder/domain_tokens get the extra epoch, so the remainder's
    expected token mass equals the remainder exactly (each doc contributes
    tokens with probability remainder/domain_tokens) while the plan is one
    partial-aggregated groupBy (domain totals, |domains| rows broadcast
    back) plus a map-only filter+explode — NO window, NO per-domain sort,
    so a single domain spanning thousands of partitions costs nothing
    extra.  Coverage is in expectation (±sqrt-of-domain-size tokens);
    `mix_by_budget` remains the exact correctness baseline and oracle."""
    sized = _sized_with_quota(
        df, weights_ppm, budget_tokens, domain_col, text_col, id_col
    )
    totals = F.broadcast(
        sized.groupBy("domain")
        .agg(F.sum("tokens").cast("long").alias("domain_tokens"))
        .where(F.col("domain_tokens") > 0)
    )
    staged = sized.join(totals, "domain")
    full = F.expr("quota div domain_tokens").cast("long")
    rem_frac = (
        (F.col("quota") - full * F.col("domain_tokens")).cast("double")
        / F.col("domain_tokens").cast("double")
    )
    n_epochs = (full + (_h60(F.col("h")) < rem_frac).cast("long")).alias(
        "n_epochs"
    )
    selected = staged.select(
        "doc_id", "domain", "tokens", n_epochs
    ).where(F.col("n_epochs") >= 1)
    return selected.select(
        "doc_id",
        "domain",
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.col("n_epochs"))
        ).alias("epoch"),
        "tokens",
        "n_epochs",
    )


def mixture_weights_ppm(
    df: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 2,
    domain_col: str = "lang",
    text_col: str = "text",
) -> "dict[str, int]":
    """Temperature-smoothed mixture weights: weight_i ∝ tokens_i^(num/den),
    normalized to parts-per-million — the standard up-weighting of scarce
    domains for multilingual/multi-source training (num/den = 1/2 is the
    common sqrt temperature; 1/1 reproduces natural proportions).

    Only exponents with den in (1, 2) are supported so the arithmetic stays
    exact-integer (``math.isqrt``) and engine-free: the per-domain token
    totals are ONE bounded aggregation (|domains| rows collected — the only
    driver-side step, legitimate at any corpus size), everything after is
    python on that tiny dict.  Feed the result straight to
    :func:`mix_by_budget` / :func:`mix_by_budget_threshold`.

    The ppm values are floor-rounded; the largest domain absorbs the
    rounding slack so the weights always sum to exactly 1_000_000.
    """
    import math

    from open_parse_spark.functions.text import token_count

    if alpha_den not in (1, 2) or alpha_num != 1:
        raise ValueError("supported exponents: 1/1 and 1/2")
    totals = {
        r["domain"]: r["tokens"]
        for r in df.groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.sum(
                token_count(F.coalesce(F.col(text_col), F.lit("")))
            )
            .cast("long")
            .alias("tokens")
        )
        .collect()
        if r["tokens"]
    }
    if not totals:
        return {}
    smoothed = {
        d: (t if alpha_den == 1 else math.isqrt(t))
        for d, t in totals.items()
    }
    denom = sum(smoothed.values())
    ppm = {d: s * 1_000_000 // denom for d, s in smoothed.items()}
    # hand the floor-rounding slack to the largest domain (deterministic
    # tie-break on name) so the weights sum to exactly 1e6
    slack = 1_000_000 - sum(ppm.values())
    top = max(smoothed, key=lambda d: (smoothed[d], d))
    ppm[top] += slack
    return ppm
