"""Independent differential test for the bigram LM quality score.

The DuckDB oracle in the registry replays the same relational plan; this
test replays the operator with a SEPARATE dict-based pure-Python model
(counts, stupid backoff, tercile bucketing written imperatively), on a
crafted corpus that exercises every branch the homogeneous synthetic
corpus cannot: unseen bigrams (backoff), unseen unigrams (zero mass),
docs with < 2 words (no bigrams -> tail), and score ties (doc_id
tie-break).
"""

import re

from open_parse_spark.operators.lm import BACKOFF_DEN, BACKOFF_NUM, PPM, lm_score

WORD_RE = re.compile(r"[A-Za-z0-9]+")


def _words(text):
    return [w.lower() for w in WORD_RE.findall(text or "")]


def _replay(rows, train_mod=2, train_rem=0):
    """Pure-Python replay: train on doc_id % mod == rem, score all."""
    uni, bi, total = {}, {}, 0
    for doc_id, text in rows:
        if doc_id % train_mod != train_rem:
            continue
        ws = _words(text)
        total += len(ws)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1

    scored = []
    for doc_id, text in rows:
        ws = _words(text)
        pairs = list(zip(ws, ws[1:]))
        p_sum = oov = 0
        for a, b in pairs:
            if (a, b) in bi:
                p_sum += (bi[(a, b)] * PPM) // uni[a]
            else:
                oov += 1
                p_sum += (BACKOFF_NUM * ((uni.get(b, 0) * PPM) // total)) // BACKOFF_DEN
        n = len(pairs)
        scored.append(
            {
                "doc_id": doc_id,
                "n_bigrams": n,
                "oov_bigrams": oov,
                "lm_score_ppm": (p_sum // n) if n else 0,
            }
        )
    scored.sort(key=lambda r: (-r["lm_score_ppm"], r["doc_id"]))
    n_docs = len(scored)
    for rank, r in enumerate(scored, start=1):
        if 3 * rank <= n_docs:
            r["bucket"] = "head"
        elif 3 * rank <= 2 * n_docs:
            r["bucket"] = "middle"
        else:
            r["bucket"] = "tail"
        r["keep"] = r["bucket"] != "tail"
    return {r["doc_id"]: r for r in scored}


CRAFTED = [
    # train half (even ids): a small fluent corpus
    (0, "the cat sat on the mat and the cat slept"),
    (2, "the dog sat on the mat and the dog ran"),
    (4, "a cat and a dog sat on the mat together"),
    (6, "the mat sat under the cat and under the dog"),
    (8, "cats and dogs sat on mats"),
    # held-out half (odd ids)
    (1, "the cat sat on the mat"),  # all bigrams seen -> high score
    (3, "the zebra sat on quantum flux"),  # unseen bigrams + unseen unigrams
    (5, "mat"),  # single word -> no bigrams -> tail
    (7, ""),  # empty -> no bigrams
    (9, "dog cat mat the on sat and a"),  # seen words, scrambled order (backoff)
    (11, "xyzzy plugh"),  # fully OOV: p_ppm 0
]


def test_crafted_branches_and_buckets(spark):
    df = spark.createDataFrame(CRAFTED, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in lm_score(df, cutoffs="window").collect()}
    want = _replay(CRAFTED)
    assert set(got) == set(want)
    for doc_id in want:
        for k in ("n_bigrams", "oov_bigrams", "lm_score_ppm", "bucket", "keep"):
            assert got[doc_id][k] == want[doc_id][k], (doc_id, k, got[doc_id], want[doc_id])
    # the crafted corpus genuinely exercises each branch
    assert got[3]["oov_bigrams"] > 0  # backoff fired
    assert got[11]["lm_score_ppm"] == 0 and got[11]["oov_bigrams"] == 1
    assert got[5]["n_bigrams"] == 0 and got[5]["bucket"] == "tail"
    assert got[1]["lm_score_ppm"] > got[3]["lm_score_ppm"]
    buckets = {r["bucket"] for r in got.values()}
    assert buckets == {"head", "middle", "tail"}


def test_real_corpus_replay(spark):
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in lm_score(df, cutoffs="window").collect()}
    want = _replay(rows)
    assert got.keys() == want.keys()
    mismatches = [
        (d, got[d], want[d])
        for d in want
        if any(got[d][k] != want[d][k] for k in want[d])
    ]
    assert not mismatches, mismatches[:3]


def test_histogram_cutoffs_match_window_off_ties(spark):
    """The scale path (broadcast histogram cutoffs, no global sort) equals
    the window form for every doc whose score is not ON a cutoff; a tie
    group straddling a cutoff lands whole in the worse bucket."""
    rows = CRAFTED
    df = spark.createDataFrame(rows, "doc_id long, text string")
    win = {r["doc_id"]: r.asDict() for r in lm_score(df, cutoffs="window").collect()}
    hist = {r["doc_id"]: r.asDict() for r in lm_score(df, cutoffs="histogram").collect()}
    assert set(win) == set(hist)
    # scores identical between modes; derive the cutoffs exactly as the
    # operator does (descending ranks n//3+1 and 2n//3+1)
    scores = sorted((r["lm_score_ppm"] for r in win.values()), reverse=True)
    n = len(scores)
    c1, c2 = scores[n // 3], scores[2 * n // 3]
    order = {"head": 0, "middle": 1, "tail": 2}
    for d in win:
        assert hist[d]["lm_score_ppm"] == win[d]["lm_score_ppm"]
        if hist[d]["lm_score_ppm"] not in (c1, c2):
            assert hist[d]["bucket"] == win[d]["bucket"], (d, hist[d], win[d])
        else:  # on a cutoff: never a BETTER bucket than the window form
            assert order[hist[d]["bucket"]] >= order[win[d]["bucket"]]
    # strict-cutoff property: buckets never exceed their tercile
    n_head = sum(1 for r in hist.values() if r["bucket"] == "head")
    n_mid = sum(1 for r in hist.values() if r["bucket"] == "middle")
    assert n_head <= n // 3 and n_head + n_mid <= 2 * n // 3


def test_empty_train_split_scores_zero_not_divide_by_zero(spark):
    """All doc_ids odd -> train half empty -> total = 0.  Every bigram takes
    the backoff branch, which must yield NULL (folded to score 0), not an
    ANSI DIVIDE_BY_ZERO (Spark 4 default); the DuckDB oracle NULL-folds the
    same way."""
    rows = [(2 * i + 1, "words appear here in every document") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for mode in ("window", "histogram"):
        got = lm_score(df, cutoffs=mode).collect()
        assert len(got) == 6
        assert all(r["lm_score_ppm"] == 0 for r in got)
        assert all(r["oov_bigrams"] == r["n_bigrams"] > 0 for r in got)


def test_histogram_all_tied_lands_in_one_bucket(spark):
    rows = [(i, "same text every time") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = lm_score(df, cutoffs="histogram").collect()
    assert {r["bucket"] for r in got} == {"tail"}
    assert not any(r["keep"] for r in got)


def test_tie_break_is_deterministic(spark):
    rows = [(i, "same text every time") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        ((r["doc_id"], r["bucket"]) for r in lm_score(df, cutoffs="window").collect()),
    )
    # identical scores -> buckets assigned purely by doc_id order
    assert [b for _, b in got] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
