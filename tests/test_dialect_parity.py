"""Cross-engine dialect parity: the DuckDB oracles are only as good as the
assumption that Spark (Java regex, UTF8String) and DuckDB (RE2, utf8proc)
agree on the exact expressions the oracles mirror.  The driver's synthetic
corpus is ASCII, so it can never catch unicode/locale divergence — this
suite checks the shared-dialect subset on a deliberately nasty corpus:
mixed scripts, combining marks, astral-plane emoji, Turkish dotted-I,
ligatures, zero-width chars, long digit/punct runs.

Any case where the engines legitimately diverge must either be excluded
from the oracle-checked expression set or documented in COVERAGE.md.
"""

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from open_parse_spark.functions import text as T

_NASTY = [
    "",
    " ",
    "plain ascii words 123",
    "Üppige Straße größer ÄÖÜ",          # latin-1 uppers + sharp s
    "İstanbul ve ısparta",                # turkish dotted/dotless i
    "ﬁne ﬂow ligatures",                  # ligature chars
    "étude résumé",     # combining acute
    "中文文本处理与分词",                   # CJK (no a-z words)
    "mixed 中文 and english 字",
    "😀 emoji 🎉 party 🚀",               # astral plane
    "tab\tand\nnewline\r\nmix",
    "a" * 100 + "0" * 50 + "!" * 30,      # long runs
    "zero​width‍joiners",
    "quotes “curly” and ‘single’",
    "MiXeD CaSe WoRdS",
    "ÅNGSTRÖM å vs å",              # precomposed vs combining ring
]


def _rand_corpus(n=40, seed=7):
    rng = random.Random(seed)
    alphabet = string.printable + "éüßñ中文😀İı́​“”"
    out = []
    for _ in range(n):
        out.append("".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120))))
    return out


CORPUS = _NASTY + _rand_corpus()


@pytest.fixture(scope="module")
def engines(spark):
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(enumerate(CORPUS)))
    return sdf, con


def _compare(spark_rows, duck_rows, label):
    mismatches = [
        (i, s, d)
        for i, (s, d) in enumerate(zip(spark_rows, duck_rows))
        if s != d
    ]
    assert not mismatches, f"{label}: {mismatches[:5]} (of {len(mismatches)})"


def test_word_and_token_counts_parity(engines):
    sdf, con = engines
    got = (
        sdf.select(
            "doc_id",
            T.word_count(F.col("text")).alias("w"),
            T.token_count(F.col("text")).alias("t"),
            T.punct_count(F.col("text")).alias("p"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    want = con.execute(
        """
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z0-9]+'))::BIGINT AS w,
               len(regexp_extract_all(text, '[A-Za-z0-9]+'))::BIGINT AS t,
               len(regexp_extract_all(text, '[^A-Za-z0-9_ \\t\\n\\x0B\\f\\r]'))::BIGINT AS p
        FROM documents ORDER BY doc_id
        """
    ).df()
    _compare(list(got["w"]), list(want["w"]), "word_count")
    _compare(list(got["t"]), list(want["t"]), "token_count")
    _compare(list(got["p"]), list(want["p"]), "punct_count")


def test_fingerprint_parity(engines):
    sdf, con = engines
    got = (
        sdf.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
        .orderBy("doc_id")
        .toPandas()
    )
    want = con.execute(
        """
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')))) AS fp
        FROM documents ORDER BY doc_id
        """
    ).df()
    _compare(list(got["fp"]), list(want["fp"]), "fingerprint")


def test_pii_scrub_parity(engines):
    sdf, con = engines
    got = (
        sdf.select("doc_id", T.scrub_pii(F.col("text")).alias("c"))
        .orderBy("doc_id")
        .toPandas()
    )
    want = con.execute(
        """
        SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
          '\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b', '<PHONE>', 'g'),
          '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g') AS c
        FROM documents ORDER BY doc_id
        """
    ).df()
    _compare(list(got["c"]), list(want["c"]), "pii_scrub")


def test_hash_bucket_parity(engines):
    sdf, con = engines
    got = (
        sdf.select("doc_id", T.hash_bucket(F.col("text"), 100).alias("b"))
        .orderBy("doc_id")
        .toPandas()
    )
    want = con.execute(
        """
        SELECT doc_id,
               ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 AS b
        FROM documents WHERE text IS NOT NULL ORDER BY doc_id
        """
    ).df()
    _compare(list(got["b"]), list(want["b"]), "hash_bucket")


def test_winnow_substr_parity(engines):
    """substr/length semantics across engines on unicode (code points vs
    UTF-16 units vs bytes) — the winnow oracle depends on them agreeing."""
    sdf, con = engines
    from open_parse_spark.operators.dedup import winnow_fingerprints

    got = (
        winnow_fingerprints(sdf, k=3, window=4)
        .groupBy("id")
        .count()
        .orderBy("id")
        .toPandas()
    )
    want = con.execute(
        """
        WITH kh AS (
          SELECT doc_id,
                 list_transform(generate_series(1, len(text) - 2),
                                i -> ('0x' || substr(md5(substr(text, i, 3)), 1, 15))::BIGINT) AS kh
          FROM documents WHERE len(text) >= 6
        )
        SELECT doc_id, len(list_distinct(
                 list_transform(generate_series(1, len(kh) - 3),
                                i -> list_min(kh[i:i+3])))) AS n
        FROM kh ORDER BY doc_id
        """
    ).df()
    assert list(got["id"]) == list(want["doc_id"])
    _compare(list(got["count"]), list(want["n"]), "winnow_fp_count")
