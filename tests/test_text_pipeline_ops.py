"""Tests for the corpus-pipeline text ops added on top of the reference
surface (SURVEY.md training-data section): PII scrubbing, deterministic
hash splits, and integer tf-idf.

The synthetic documents corpus contains zero PII matches, so the driver's
DuckDB oracle only proves the no-op path for pii_scrub; these tests pin the
positive path — crafted PII strings — against both expected literals AND
DuckDB's regexp engine, so the Java-regex/RE2 dialect parity the oracle
relies on is actually exercised.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from open_parse_spark.functions import text as T

PII_CASES = [
    # (input, expected scrub, n_emails, n_ips, n_phones)
    ("contact bob.smith+spam@example.co.uk today", "contact <EMAIL> today", 1, 0, 0),
    ("server at 10.0.255.3 rebooted", "server at <IP> rebooted", 0, 1, 0),
    ("call 555-867-5309 or 555.867.5309", "call <PHONE> or <PHONE>", 0, 0, 2),
    (
        "a@b.io via 192.168.1.1 ph 123 456 7890",
        "<EMAIL> via <IP> ph <PHONE>",
        1,
        1,
        1,
    ),
    ("no pii here at all", "no pii here at all", 0, 0, 0),
    # order pinning: the email is scrubbed before its digits can match, but
    # counts are raw per-pattern matches on the original text (phone counts)
    ("mail 555-123-4567@example.com now", "mail <EMAIL> now", 1, 0, 1),
    # version strings are the known ipv4 false-positive class — document it
    ("pip install pkg==1.2.3.4 ok", "pip install pkg==<IP> ok", 0, 1, 0),
]


@pytest.fixture(scope="module")
def pii_rows(spark):
    df = spark.createDataFrame([(i, t) for i, (t, *_ ) in enumerate(PII_CASES)], ["i", "text"])
    counts = T.pii_counts(F.col("text"))
    out = df.select(
        "i",
        T.scrub_pii(F.col("text")).alias("clean"),
        counts["n_emails"].alias("e"),
        counts["n_ips"].alias("ip"),
        counts["n_phones"].alias("p"),
    ).toPandas().set_index("i").sort_index()
    return out


def test_scrub_pii_expected_literals(pii_rows):
    for i, (_, want, e, ip, p) in enumerate(PII_CASES):
        assert pii_rows.loc[i, "clean"] == want
        assert (pii_rows.loc[i, "e"], pii_rows.loc[i, "ip"], pii_rows.loc[i, "p"]) == (e, ip, p)


def test_scrub_pii_duckdb_dialect_parity(pii_rows):
    """The same chained regexp_replace in DuckDB (RE2) must produce the same
    bytes as Spark (Java regex) for every crafted case."""
    con = duckdb.connect()
    for i, (text, _, _, _, _) in enumerate(PII_CASES):
        got = con.execute(
            """
            SELECT regexp_replace(regexp_replace(regexp_replace($1,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
              '\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b', '<PHONE>', 'g'),
              '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g')
            """,
            [text],
        ).fetchone()[0]
        assert got == pii_rows.loc[i, "clean"], (text, got, pii_rows.loc[i, "clean"])


def test_hash_bucket_deterministic_and_uniform(spark):
    df = spark.range(0, 10_000).select(F.col("id"))
    b = df.select(T.hash_bucket(F.col("id"), 100).alias("b")).toPandas()["b"]
    assert b.min() >= 0 and b.max() <= 99
    # same input -> same bucket (rerun)
    b2 = df.select(T.hash_bucket(F.col("id"), 100).alias("b")).toPandas()["b"]
    assert (b == b2).all()
    # roughly uniform: every bucket within 3x of expectation
    counts = b.value_counts()
    assert len(counts) == 100
    assert counts.max() < 300 and counts.min() > 33


def test_winnow_guarantee(spark):
    """Winnowing's core guarantee: two docs sharing a substring of length
    >= k + window - 1 (= 23 chars at k=8, w=16) MUST share at least one
    fingerprint; unrelated docs (random hex) share none."""
    import hashlib
    from open_parse_spark.operators.dedup import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    noise_a = hashlib.sha256(b"a").hexdigest() * 3
    noise_b = hashlib.sha256(b"b").hexdigest() * 3
    rows = [
        (1, noise_a + shared + noise_b),
        (2, noise_b + shared + noise_a),
        (3, hashlib.sha256(b"c").hexdigest() * 5),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = winnow_fingerprints(df, id_col="doc_id").toPandas()
    by_doc = {d: set(g["fp"]) for d, g in fps.groupby("id")}
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    # density: stored set is ~1/window of the k-gram count
    n_grams = len(rows[0][1]) - 7
    assert len(by_doc[1]) < n_grams / 4


def test_tfidf_rank_is_deterministic(spark, tmp_path):
    """Rare distinctive terms outrank common ones; ties break by term."""
    rows = [
        (1, "zebra zebra common common common"),
        (2, "common common common yak yak"),
        (3, "common plain words only here"),
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(p)
    from open_parse_spark.plans.queries import q_tfidf_top_terms

    out = q_tfidf_top_terms(spark, str(tmp_path)).toPandas()
    top1 = out[out["rank"] == 1].set_index("doc_id")["term"]
    assert top1.loc[1] == "zebra"
    assert top1.loc[2] == "yak"


def test_remove_boilerplate_lines_semantics(spark):
    """CCNet-style line-level dedup: corpus-repeated lines drop, short/empty
    structural lines and unique content survive in order; every doc stays in
    the output."""
    import pandas as pd

    from open_parse_spark.operators.dedup import remove_boilerplate_lines

    footer = "Copyright Example Corp"
    nav = "Home | About | Contact"
    rows = [
        (0, f"{nav}\nunique alpha content\n\n{footer}"),
        (1, f"{nav}\nunique beta content\nok\n{footer}"),
        (2, f"{nav}\nunique gamma content\n{footer}"),
        (3, f"{nav}\n{footer}"),  # all-boilerplate doc -> empty
        (4, "shared twice only\nown words here"),
        (5, "shared twice only\nother words here"),  # df=2 < min_df=3: kept
        (6, None),  # NULL text -> one empty line, kept
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
            {"doc_id": "int64"}
        )
    )
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(df, min_df=3, min_chars=5).collect()
    }
    assert out[0].clean_text == "unique alpha content\n"  # empty line kept
    assert out[0].n_lines_kept == 2 and out[0].n_lines_dropped == 2
    assert out[1].clean_text == "unique beta content\nok"  # "ok" < 5 chars
    assert out[2].clean_text == "unique gamma content"
    assert out[3].clean_text == "" and out[3].n_lines_kept == 0
    assert out[3].n_lines_dropped == 2
    assert out[4].clean_text == "shared twice only\nown words here"
    assert out[5].clean_text == "shared twice only\nother words here"
    assert out[6].clean_text == "" and out[6].n_lines_kept == 1
    # trimmed-form matching: "  Copyright Example Corp  " drops too
    df2 = spark.createDataFrame(
        pd.DataFrame(
            [(0, f"  {footer}  \nx words enough"), (1, footer), (2, footer)],
            columns=["doc_id", "text"],
        ).astype({"doc_id": "int64"})
    )
    out2 = {
        r.doc_id: r
        for r in remove_boilerplate_lines(df2, min_df=3, min_chars=5).collect()
    }
    assert out2[0].clean_text == "x words enough"


def test_linear_quality_score_matches_python_reimplementation(spark):
    """Spark JVM score == independent python md5-bucket reimplementation."""
    import hashlib
    import re as _re

    import pandas as pd
    from pyspark.sql import functions as F

    from open_parse_spark.functions.text import (
        classifier_weights,
        linear_quality_score,
    )

    w = classifier_weights()
    assert w == classifier_weights(), "weights must be deterministic"
    assert len(w) == 64 and all(-8 <= v < 8 for v in w)

    texts = [
        "the quick brown fox",
        "",
        None,
        "UPPER lower MiXeD 123 456789",
        "word " * 500,
        "!!! ??? only punctuation",
    ]

    def py_score(t):
        if not t:
            return 0
        ws = [x.lower() for x in _re.findall(r"[A-Za-z0-9]+", t)]
        return sum(
            w[int(hashlib.md5(x.encode()).hexdigest()[:15], 16) % 64]
            for x in ws
        )

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id",
            linear_quality_score(F.coalesce(F.col("text"), F.lit(""))).alias("s"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_score(t), (i, t, got[i], py_score(t))


def test_conv_fingerprint_nonlatin_conversations_stay_distinct(spark):
    """All-CJK/emoji conversations normalize to '' under [^a-z0-9]; the raw-
    text fallback keeps distinct ones distinct while identical ones dedup."""
    import datetime

    import pandas as pd

    from open_parse_spark.operators.conversations import (
        conversation_fingerprint_dedup,
    )

    ts = datetime.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", "你好世界", "", ts),
        ("c2", 0, "user", "完全不同的内容", "", ts),
        ("c3", 0, "user", "你好世界", "", ts),  # byte-identical to c1
        ("c4", 0, "user", "hello latin", "", ts),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
    )
    out = conversation_fingerprint_dedup(df).collect()
    groups = {r.keep_conv_id: r.dup_count for r in out}
    assert groups == {"c1": 2, "c2": 1, "c4": 1}, groups


def test_lsh_derives_embedding_dim_from_data(spark):
    """Non-64-dim embeddings must work without passing dim explicitly."""
    import pandas as pd

    from open_parse_spark.operators.similarity import lsh_topk

    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(20),
                "embedding": [
                    [float((i * j) % 7 + 1) / 8 for j in range(1, 17)]  # dim 16
                    for i in range(20)
                ],
            }
        )
    )
    queries = emb.where("vec_id < 2")
    rows = lsh_topk(emb, queries, k=3).collect()
    assert rows and all(r.rank <= 3 for r in rows)


def test_vocab_coverage_crafted(spark, tmp_path):
    """Hand-computed frequency/rank/coverage on a crafted corpus; the
    sf0.01 gate covers the corpus-scale equality."""
    import pandas as pd

    from open_parse_spark.plans.queries import q_vocab_coverage

    rows = [
        (1, "apple apple apple banana banana cherry", "en", "s", 1),
        (2, "apple banana date", "en", "s", 1),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    out = [tuple(r) for r in q_vocab_coverage(spark, str(tmp_path)).collect()]
    # freq: apple 4, banana 3, cherry 1, date 1 (total 9); ties word-asc
    assert out == [
        ("apple", 4, 1, 4, 4 * 1_000_000 // 9),
        ("banana", 3, 2, 7, 7 * 1_000_000 // 9),
        ("cherry", 1, 3, 8, 8 * 1_000_000 // 9),
        ("date", 1, 4, 9, 1_000_000),
    ]
    # invariants: contiguous ranks, monotone coverage, full coverage last
    ranks = [r[2] for r in out]
    cov = [r[4] for r in out]
    assert ranks == list(range(1, len(out) + 1))
    assert cov == sorted(cov) and cov[-1] == 1_000_000
