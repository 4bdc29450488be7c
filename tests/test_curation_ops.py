"""Unit tests for the training-data curation operators added in round 2
part 3: decontamination, cluster representatives, sequence packing,
stratified sampling, repetition quality.  Hand-computed expectations on
crafted inputs (the sf0.01 oracle gate covers the corpus-level equality)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from open_parse_spark.operators.dedup import (
    cluster_representatives,
    ngram_contamination,
)
from open_parse_spark.operators.packing import pack_sequences
from open_parse_spark.operators.sampling import stratified_sample


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_ngram_contamination_crafted(spark):
    bench = _docs(spark, [(0, "alpha beta gamma delta epsilon", "en", "s", 1)])
    train = _docs(
        spark,
        [
            # shares 'alpha beta gamma delta' and 'beta gamma delta epsilon'
            (1, "alpha beta gamma delta epsilon zeta", "en", "s", 1),
            # no 4-gram overlap
            (2, "one two three four five", "en", "s", 1),
            # too short for any 4-gram
            (3, "alpha beta", "en", "s", 1),
        ],
    )
    out = {
        r["doc_id"]: (r["shared_grams"], r["contaminated"])
        for r in ngram_contamination(train, bench, n=4).collect()
    }
    assert out == {1: (2, True), 2: (0, False), 3: (0, False)}


def test_cluster_representatives_tiebreak(spark):
    docs = _docs(
        spark,
        [
            (1, "a", "en", "s", 10),
            (2, "b", "en", "s", 30),  # rep of {1,2,3}: max n_chars
            (3, "c", "en", "s", 30),  # ties with 2; loses on higher id
            (4, "d", "en", "s", 5),  # singleton -> its own rep
        ],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    out = {r["doc_id"]: (r["component"], r["is_rep"]) for r in
           cluster_representatives(docs, pairs).collect()}
    assert out == {1: (1, False), 2: (1, True), 3: (1, False), 4: (4, True)}


def test_pack_sequences_greedy_fold(spark):
    # capacity 10; shard A word counts in doc order: 4, 4, 4, 12, 1
    rows = [
        (1, "w " * 4, "x", "A", 1),
        (2, "w " * 4, "x", "A", 1),
        (3, "w " * 4, "x", "A", 1),
        (4, "w " * 12, "x", "A", 1),  # overfull: own bin
        (5, "w", "x", "A", 1),
        (6, "w " * 9, "x", "B", 1),  # second shard independent
    ]
    out = pack_sequences(_docs(spark, rows), capacity=10).collect()
    got = {r["doc_id"]: (r["bin_id"], r["bin_fill"]) for r in out}
    assert got == {
        1: (0, 4),
        2: (0, 8),
        3: (1, 4),  # 8+4 > 10 -> new bin
        4: (2, 12),  # 4+12 > 10 -> new overfull bin
        5: (3, 1),  # 12+1 > 10 -> new bin
        6: (0, 9),
    }


def test_pack_sequences_differential(spark):
    """applyInPandas fold == pure-python fold on a randomized-ish corpus."""
    rows = [
        (i, "w " * ((i * 7919) % 23 + 1), "x", f"s{i % 3}", 1) for i in range(60)
    ]
    out = pack_sequences(_docs(spark, rows), capacity=16).collect()
    got = {r["doc_id"]: (r["bin_id"], r["bin_fill"]) for r in out}
    for shard in range(3):
        docs = sorted((i, (i * 7919) % 23 + 1) for i in range(60) if i % 3 == shard)
        bin_id, fill = 0, 0
        for j, (doc_id, w) in enumerate(docs):
            if j == 0:
                fill = w
            elif fill + w <= 16:
                fill += w
            else:
                bin_id, fill = bin_id + 1, w
            assert got[doc_id] == (bin_id, fill), doc_id


def test_stratified_sample_quota_and_determinism(spark):
    rows = [
        (i, f"text number {i}", ["en", "fr", "de"][i % 3], "s", 1)
        for i in range(31)
    ]
    docs = _docs(spark, rows)
    out = stratified_sample(docs, num=1, den=5).collect()
    by_stratum = {}
    for r in out:
        by_stratum.setdefault(r["stratum"], []).append(r)
    # strata sizes: en=11, fr=10, de=10 -> quotas ceil/5 = 3, 2, 2
    assert {k: len(v) for k, v in by_stratum.items()} == {
        "en": 3, "fr": 2, "de": 2,
    }
    # selection = smallest md5("id:text"), replicated here in pure python
    for stratum, kept in by_stratum.items():
        pool = [
            (hashlib.md5(f"{i}:text number {i}".encode()).hexdigest(), i)
            for i in range(31)
            if ["en", "fr", "de"][i % 3] == stratum
        ]
        expect = {i for _, i in sorted(pool)[: len(kept)]}
        assert {r["doc_id"] for r in kept} == expect
    # deterministic across runs
    again = stratified_sample(docs, num=1, den=5).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_quality_repetition_flags(spark):
    from open_parse_spark.plans.queries import q_quality_repetition

    # write a tiny documents.parquet so the registry query runs on it
    import os
    import tempfile

    rows = [
        # 'a b a b a b': 2-grams = [a b, b a, a b, b a, a b] -> top2=3, n2=5
        # 3-grams = [a b a, b a b, a b a, b a b] -> dup3=4, n3=4
        (1, "a b a b a b", "en", "s", 11),
        # all distinct words: top2=1, dup3=0
        (2, "one two three four five six", "en", "s", 27),
        # too short for ANY gram: must still be audited (zero counts, keep)
        (3, "hi", "en", "s", 2),
        (4, "", "en", "s", 0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs(spark, rows).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: r.asDict() for r in q_quality_repetition(spark, d).collect()}
    assert out[1]["top2"] == 3 and out[1]["n2"] == 5
    assert out[1]["dup3"] == 4 and out[1]["n3"] == 4
    assert not out[1]["top2_ok"] and not out[1]["dup3_ok"] and not out[1]["keep"]
    assert out[2]["top2"] == 1 and out[2]["dup3"] == 0
    assert out[2]["top2_ok"] and out[2]["dup3_ok"] and out[2]["keep"]
    # sub-gram docs are audited, not dropped: zero counts, vacuous pass
    for short_id in (3, 4):
        assert short_id in out
        assert out[short_id]["n2"] == 0 and out[short_id]["n3"] == 0
        assert out[short_id]["keep"]


def test_pack_sequences_non_string_shard(spark):
    # shard_col is caller-configurable; an int column (e.g. a date bucket)
    # must be cast to string before the Arrow stage, not crash on schema
    # mismatch — ADVICE r2 fix
    df = spark.createDataFrame(
        [(1, "a b c", 7), (2, "d e", 7), (3, "f", 8)],
        "doc_id long, text string, bucket int",
    )
    out = {
        (r["doc_id"], r["shard"]): r["bin_id"]
        for r in pack_sequences(df, capacity=4, shard_col="bucket").collect()
    }
    assert out == {(1, "7"): 0, (2, "7"): 1, (3, "8"): 0}


def test_duplicate_spans_crafted(spark):
    # docs 1 and 2 share an 8-word run ("the quick ... lazy dog"); doc 3 is
    # unrelated.  n=4, min_df=2: flagged positions merge into ONE maximal
    # span per doc covering exactly the shared run.
    from open_parse_spark.operators.dedup import duplicate_spans

    shared = "the quick brown fox jumps over lazy dog"
    rows = [
        (1, f"intro words here {shared} tail one", "en", "s", 1),
        (2, f"{shared} completely different ending text", "en", "s", 1),
        (3, "nothing in common with anything else at all", "en", "s", 1),
    ]
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in duplicate_spans(_docs(spark, rows), n=4, min_df=2).collect()
    }
    # doc 1: shared run starts at word 3 (0-based), 8 words -> span [3, 10]
    # flagged 4-gram starts: 3..7 -> 5 grams
    assert out[1] == (3, 10, 5)
    # doc 2: run starts at 0 -> span [0, 7]
    assert out[2] == (0, 7, 5)
    assert 3 not in out


def test_duplicate_spans_merge_overlapping_ranges(spark):
    # flagged positions p and p+2 (unflagged p+1 between them) have
    # overlapping word ranges and must merge into ONE span — the naive
    # adjacency islanding emitted two overlapping spans (review finding)
    from open_parse_spark.operators.dedup import duplicate_spans

    # doc 1 & 2 share gram at pos 0 ("a b c d") and pos 2 ("c d e x") but
    # doc 2's pos-1 gram differs (doc1 "b c d e" vs doc2 "b c d q")... build
    # via explicit word lists:
    d1 = "a b c d e x tail1 tail2"
    d2 = "a b c d zz a b q q c d e x q q"  # shares "a b c d" and "c d e x"
    rows = [(1, d1, "en", "s", 1), (2, d2, "en", "s", 1)]
    out = duplicate_spans(_docs(spark, rows), n=4, min_df=2).collect()
    spans1 = sorted(
        (r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in out
        if r["doc_id"] == 1
    )
    # doc 1: flagged at pos 0 ("a b c d") and pos 2 ("c d e x"); pos 1
    # ("b c d e") appears only in doc 1 -> unflagged.  gap 2 <= n-1 -> ONE
    # merged span [0, 5] with 2 flagged grams.
    assert spans1 == [(0, 5, 2)], out
    # no overlapping spans anywhere
    for doc in (1, 2):
        ss = sorted(
            (r["span_start"], r["span_end"]) for r in out if r["doc_id"] == doc
        )
        for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
            assert s2 > e1, f"overlapping spans for doc {doc}: {ss}"


def test_bloom_decontaminate_crafted(spark):
    from open_parse_spark.operators.dedup import bloom_decontaminate

    bench = _docs(spark, [(0, "alpha beta gamma delta epsilon", "en", "s", 1)])
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta", "en", "s", 1),
            (2, "one two three four five", "en", "s", 1),
            (3, "alpha beta", "en", "s", 1),
        ],
    )
    # roomy filter: no collisions expected on 5 grams -> matches exact op
    out = {
        r["doc_id"]: (r["n_grams"], r["bloom_hits"], r["bloom_contaminated"])
        for r in bloom_decontaminate(train, bench, m=1 << 20, k=4, n=4).collect()
    }
    assert out == {1: (3, 2, True), 2: (2, 0, False), 3: (0, 0, False)}


def test_bloom_decontaminate_never_misses(spark):
    """Bloom guarantee: flagged docs are a SUPERSET of truly-contaminated
    docs at any (m, k) — even a saturated 64-bit filter."""
    from open_parse_spark.operators.dedup import (
        bloom_decontaminate,
        ngram_contamination,
    )

    # benchmark + even train docs share vocabulary A; odd train docs use a
    # DISJOINT vocabulary B, so they are exactly-clean — the only way they
    # can flag is a bloom position collision (the false-positive channel)
    vocab_a = "the of and to in a is it for on with as by at from".split()
    vocab_b = "zork quux wibble plugh grault corge fnord xyzzy blorp snarf".split()
    rows = []
    for d in range(40):
        words = vocab_a if (d % 5 == 0 or d % 2 == 0) else vocab_b
        text = " ".join(words[(d * 7 + j) % len(words)] for j in range(12))
        rows.append((d, text, "en", "s", 1))
    docs = _docs(spark, rows)
    bench = docs.where(F.col("doc_id") % 5 == 0)
    train = docs.where(F.col("doc_id") % 5 != 0)

    exact = {
        r["doc_id"]
        for r in ngram_contamination(train, bench, n=3).collect()
        if r["contaminated"]
    }
    for m, k in ((1 << 20, 4), (64, 2)):
        flagged = {
            r["doc_id"]
            for r in bloom_decontaminate(train, bench, m=m, k=k, n=3).collect()
            if r["bloom_contaminated"]
        }
        assert exact <= flagged, (m, k, exact - flagged)
    # the saturated filter must actually show false positives, or the
    # approximation test is vacuous
    small_flagged = {
        r["doc_id"]
        for r in bloom_decontaminate(train, bench, m=64, k=2, n=3).collect()
        if r["bloom_contaminated"]
    }
    assert small_flagged - exact, "expected false positives at m=64"


def test_bloom_decontaminate_rejects_non_power_of_two(spark):
    from open_parse_spark.operators.dedup import bloom_decontaminate

    docs = _docs(spark, [(0, "a b c d e", "en", "s", 1)])
    with pytest.raises(ValueError):
        bloom_decontaminate(docs, docs, m=1000)


def test_mix_by_budget_epochs_and_remainder(spark):
    """Pure-python replay of the mixture algorithm on a crafted corpus:
    domain 'a' is scarcer than its quota (multi-epoch up-sampling path),
    'b' is larger (greedy remainder prefix incl. the crossing doc),
    'c' has weight 0 (quota 0 -> nothing), 'd' is unweighted (excluded)."""
    from open_parse_spark.operators.sampling import mix_by_budget

    rows = [
        (1, "one two three four", "x", "a", 1),          # 4 tokens
        (2, "five six seven eight", "x", "a", 1),        # 4
        (3, "nine ten eleven twelve", "x", "a", 1),      # 4
        (4, "a b c d e f", "x", "b", 1),                 # 6
        (5, "g h i j k l m n", "x", "b", 1),             # 8
        (6, "o p q r s", "x", "b", 1),                   # 5
        (7, "zero weight domain doc", "x", "c", 1),
        (8, "unweighted domain doc", "x", "d", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    weights = {"a": 750_000, "b": 250_000, "c": 0}
    budget = 40  # quotas: a=30, b=10, c=0
    out = mix_by_budget(docs, weights, budget, domain_col="source").collect()

    # python replay
    toks = {r[0]: len(r[1].split()) for r in rows}
    expect = []
    for dom, quota in (("a", 30), ("b", 10), ("c", 0)):
        pool = sorted(
            (hashlib.md5(f"{i}:{t}".encode()).hexdigest(), i)
            for i, t, _l, s, _n in rows
            if s == dom
        )
        total = sum(toks[i] for _, i in pool)
        if total == 0:
            continue
        full, rem, cum = quota // total, quota % total, 0
        for _, i in pool:
            n = full + (1 if cum < rem else 0)
            cum += toks[i]
            expect += [(i, dom, e, toks[i], n) for e in range(1, n + 1)]
    assert sorted(map(tuple, out)) == sorted(expect)
    # domain quotas are covered (the crossing doc is included)
    got_tokens = {}
    for doc_id, dom, _e, t, _n in out:
        got_tokens[dom] = got_tokens.get(dom, 0) + t
    assert got_tokens["a"] >= 30 and got_tokens["b"] >= 10
    assert "c" not in got_tokens and "d" not in got_tokens


def test_mix_by_budget_null_text_and_empty_domain(spark):
    from open_parse_spark.operators.sampling import mix_by_budget

    docs = spark.createDataFrame(
        [
            (1, None, "x", "a", 1),     # NULL text -> 0 tokens
            (2, "w1 w2", "x", "a", 1),  # 2 tokens
            (3, None, "x", "b", 1),     # whole domain 0 tokens -> excluded
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = mix_by_budget(docs, {"a": 500_000, "b": 500_000}, 8,
                        domain_col="source").collect()
    # a: quota 4, total 2 -> full=2, rem=0; null-text doc rides along with
    # tokens=0 (its prefix position decides the extra epoch: cum<0 never)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    assert set(by_doc) == {1, 2}
    assert sorted(by_doc[2]) == [1, 2]
    assert sorted(by_doc[1]) == [1, 2]  # full epochs apply to 0-token rows
    assert all(r["domain"] == "a" for r in out)


def _h60_py(i, text):
    parts = [str(i)] + ([text] if text is not None else [])
    return int(hashlib.md5(":".join(parts).encode()).hexdigest()[:15], 16) / float(1 << 60)


def test_threshold_variants_replay_and_window_free(spark):
    """The 100TB hash-threshold shapes: bit-identical to a pure-python
    replay of the same double arithmetic, quota covered within binomial
    tolerance, and the plans contain NO window/sort (map-only after the
    broadcast agg)."""
    from open_parse_spark.operators.sampling import (
        mix_by_budget_threshold,
        stratified_sample_threshold,
    )

    rows = [
        (i, " ".join(f"w{j}" for j in range(2 + i % 7)),
         ["en", "fr"][i % 2], "s", 1)
        for i in range(400)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    # stratified: selection == {h60 < num/den}, exactly as python computes it
    out = stratified_sample_threshold(docs, num=1, den=5).collect()
    expect_ids = {i for i, t, *_ in rows if _h60_py(i, t) < 1 / 5}
    assert {r["doc_id"] for r in out} == expect_ids
    # binomial tolerance around the 80-per-stratum quota (n=400, p=0.2)
    assert abs(len(out) - 80) < 4 * (400 * 0.2 * 0.8) ** 0.5

    # mixer: python replay of quota/full/remainder-threshold arithmetic
    toks = {i: len(t.split()) for i, t, *_ in rows}
    text_of = {i: t for i, t, *_ in rows}
    weights, budget = {"en": 600_000, "fr": 400_000}, 3000
    got = mix_by_budget_threshold(docs, weights, budget).collect()
    expect = []
    for dom, quota in (("en", 1800), ("fr", 1200)):
        pool = [i for i, t, l, *_ in rows if l == dom]
        total = sum(toks[i] for i in pool)
        full, rem = quota // total, quota % total
        for i in pool:
            n = full + (1 if _h60_py(i, text_of[i]) < rem / total else 0)
            expect += [(i, dom, e, toks[i], n) for e in range(1, n + 1)]
    assert sorted(map(tuple, got)) == sorted(expect)
    # expected-coverage: selected tokens within 4 sigma of the quota
    by_dom = {}
    for doc_id, dom, _e, t, _n in got:
        by_dom[dom] = by_dom.get(dom, 0) + t
    for dom, quota in (("en", 1800), ("fr", 1200)):
        assert abs(by_dom[dom] - quota) < 350, (dom, by_dom[dom])

    # plan discipline: no Window, no CartesianProduct in either plan
    for frame in (
        stratified_sample_threshold(docs, num=1, den=5),
        mix_by_budget_threshold(docs, weights, budget),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "CartesianProduct" not in plan


def test_mixture_weights_ppm_sqrt_temperature(spark):
    import math

    rows = []
    did = 0
    # en: 16 docs x 4 tokens = 64; fr: 4 x 4 = 16; de: 1 x 4 = 4
    for lang, n in (("en", 16), ("fr", 4), ("de", 1)):
        for _ in range(n):
            rows.append((did, "w1 w2 w3 w4", lang, "s", 1)); did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from open_parse_spark.operators.sampling import mixture_weights_ppm

    # natural proportions: 64:16:4 -> ppm floor + slack to largest
    nat = mixture_weights_ppm(docs, 1, 1)
    assert sum(nat.values()) == 1_000_000
    assert nat["fr"] == 16 * 1_000_000 // 84 and nat["de"] == 4 * 1_000_000 // 84
    # sqrt temperature: isqrt(64)=8, isqrt(16)=4, isqrt(4)=2 -> 8:4:2
    sq = mixture_weights_ppm(docs)
    assert sum(sq.values()) == 1_000_000
    assert sq["fr"] == 4 * 1_000_000 // 14 and sq["de"] == 2 * 1_000_000 // 14
    # scarce domains gain share under the sqrt temperature
    assert sq["de"] > nat["de"] and sq["en"] < nat["en"]
    # composes with the mixer
    from open_parse_spark.operators.sampling import mix_by_budget

    out = mix_by_budget(docs, sq, 56).collect()
    assert {r["domain"] for r in out} == {"en", "fr", "de"}


def test_mix_quota_arithmetic_is_overflow_free(spark):
    """floor(ppm*budget/1e6) via the host-side budget split: exact at
    frontier budgets where the naive ppm*budget product exceeds int64
    (review finding — ppm=1e6 overflowed past ~9.2T tokens)."""
    budget = 15_000_000_000_000  # 15T tokens, past the old overflow point
    bq, br = divmod(budget, 1_000_000)
    expr = (
        f"weight_ppm * CAST({bq} AS BIGINT)"
        f" + (weight_ppm * CAST({br} AS BIGINT)) div 1000000"
    )
    rows = [(1,), (333,), (499_999,), (500_000,), (999_999,), (1_000_000,)]
    got = {
        r["weight_ppm"]: r["quota"]
        for r in spark.createDataFrame(rows, "weight_ppm long")
        .selectExpr("weight_ppm", f"{expr} AS quota")
        .collect()
    }
    for (ppm,) in rows:
        assert got[ppm] == ppm * budget // 1_000_000, ppm
