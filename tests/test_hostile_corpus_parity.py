"""Hostile-corpus oracle parity: every SQL-checked registry query must agree
with its DuckDB oracle on a corpus the synthetic fixtures never show it —
NULL/empty/whitespace texts, punctuation-only rows, numeric-only rows, a
50k-char document, degenerate duplicates.  ASCII only: non-ASCII engine
differences are pinned separately in test_dialect_parity.py.

This is the test the code-review NULL findings (pack shard join, sample
hash) would have failed before their fixes."""

import os

import duckdb
import pandas as pd
import pytest

DOC_ROWS = [
    # (doc_id, text, lang, source, n_chars)
    (0, None, "en", "src0", 0),
    (1, "", "en", "src0", 0),
    (2, "   \t  ", "en", None, 6),
    (3, "x", None, "src1", 1),
    (4, "!!! ??? ... ###", "en", "src1", 15),
    (5, "12345 67890 111 222 333", "en", "src1", 23),
    (6, "word " * 10000, "en", "src2", 50000),
    (7, "dup dup dup dup dup dup dup dup", "en", "src2", 31),
    (8, "the quick brown fox jumps over the lazy dog again and again", "en", "src2", 60),
    (9, "the quick brown fox jumps over the lazy dog again and again", "fr", "src3", 60),
    (10, "Short.", "de", "src3", 6),
    (11, "a b " * 300, "en", "src3", 1200),
    (12, "unique words only here nothing repeats ever at all truly", "es", None, 57),
    (13, None, None, None, 0),
    (14, "the and of to is in a " * 20, "en", "src4", 440),
    (15, "tab\tseparated\twords\there", "zh", "src4", 24),
    (16, "mixed 123 words and 456 numbers 789 interleaved", "en", "src4", 47),
    (17, "trailing spaces    ", "en", "src5", 19),
    # 17 % 17 == 0 -> benchmark slice membership exercised with doc 0 + 17
]

# queries whose inputs aren't the documents table, or that are rows-only,
# or that need >2 distinct well-formed embeddings — excluded with reasons
SKIP = {
    # rows-only in the registry (no oracle to compare)
    "parse_flagship", "parse_metrics", "parse_bbox_debug", "ann_ivf",
    "ann_recall", "parse_semantic", "export_relations",
    "conversation_assembly", "eval_metrics", "eval_variant_mix",
    # embeddings/events-table queries: inputs unchanged by this corpus
    "ann_lsh", "ann_recall_lsh", "ann_cosine_topk", "neardup_cosine",
    "events_sessionize", "events_asof_join", "events_hourly",
    "op_spatial_anti_join",  # reads lineitem/part, absent here
    "multimodal_meta", "multimodal_frames", "multimodal_features",
}


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("hostile")
    pdf = pd.DataFrame(
        DOC_ROWS, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    con.execute(
        f"COPY (SELECT doc_id::BIGINT AS doc_id, text, lang, source, "
        f"n_chars::BIGINT AS n_chars FROM docs) "
        f"TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    # minimal well-formed side tables so table-agnostic plumbing resolves
    con.execute(
        f"COPY (SELECT i::BIGINT AS vec_id, "
        f"list_transform(generate_series(1, 8), x -> (i * x)::FLOAT / 10) AS embedding, "
        f"(i % 3)::INT AS label FROM generate_series(0, 9) t(i)) "
        f"TO '{d}/embeddings.parquet' (FORMAT PARQUET)"
    )
    return str(d)


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif str(pdf[c].dtype).startswith("float"):
            pdf[c] = pdf[c].round(6)
    return pdf.sort_values(list(pdf.columns), kind="stable").reset_index(
        drop=True
    )


def test_hostile_corpus_oracle_parity(spark, hostile_dir):
    from open_parse_spark.plans.queries import REGISTRY

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{hostile_dir}/{t}.parquet'"
        )

    failures = []
    for name, (fn, sql) in REGISTRY.items():
        if sql is None or name in SKIP:
            continue
        try:
            got = _normalize(fn(spark, hostile_dir).toPandas())
            want = _normalize(con.execute(sql).df())
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: raised {type(exc).__name__}: {exc}")
            continue
        if len(got) != len(want):
            failures.append(f"{name}: rows {len(got)} != {len(want)}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append(
                f"{name}: cols {list(got.columns)} != {list(want.columns)}"
            )
            continue
        if not got.equals(want):
            diff = (got != want) & ~(got.isna() & want.isna())
            failures.append(
                f"{name}: value mismatch in rows "
                f"{list(got.index[diff.any(axis=1)])[:5]}"
            )
    assert not failures, "\n".join(failures)
