"""CLI smoke for the curation subcommands (pack / sample / decontaminate) +
a hypothesis property test for packing invariants."""

import os

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def docs_parquet(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    p = str(d / "docs.parquet")
    con = duckdb.connect()
    con.execute(
        """
        COPY (
          SELECT i AS doc_id,
                 CASE WHEN i % 7 = 0
                      THEN 'alpha beta gamma delta epsilon zeta eta theta'
                      ELSE 'word' || i::VARCHAR || ' filler text sample number ' ||
                           repeat('tok ', i % 40)
                 END AS text,
                 ['en','fr','de'][(i % 3) + 1] AS lang,
                 'src' || (i % 4)::VARCHAR AS source,
                 42::BIGINT AS n_chars
          FROM generate_series(0, 99) t(i)
        ) TO '{}' (FORMAT PARQUET)
        """.format(p)
    )
    return p


def _run_cli(args):
    from open_parse_spark.cli import main

    return main(args)


def test_cli_pack(docs_parquet, tmp_path):
    out = str(tmp_path / "packed")
    assert _run_cli(
        ["pack", "--input", docs_parquet, "--output", out, "--capacity", "64"]
    ) == 0
    con = duckdb.connect()
    n, bins = con.execute(
        f"SELECT count(*), count(DISTINCT (shard, bin_id)) FROM '{out}/*.parquet'"
    ).fetchone()
    assert n == 100 and bins >= 4


def test_cli_sample(docs_parquet, tmp_path):
    out = str(tmp_path / "sampled")
    assert _run_cli(
        ["sample", "--input", docs_parquet, "--output", out, "--den", "4"]
    ) == 0
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT stratum, count(*) FROM '{out}/*.parquet' GROUP BY 1"
    ).fetchall()
    # 100 docs over 3 langs (34/33/33) -> quotas ceil/4 = 9/9/9
    assert sorted(c for _, c in rows) == [9, 9, 9]


def test_cli_decontaminate(docs_parquet, tmp_path):
    out = str(tmp_path / "decon")
    assert _run_cli(
        [
            "decontaminate",
            "--input", docs_parquet,
            "--benchmark", docs_parquet,
            "--output", out,
            "--ngram", "4",
        ]
    ) == 0
    con = duckdb.connect()
    n, contaminated = con.execute(
        f"SELECT count(*), sum(contaminated::INT) FROM '{out}/*.parquet'"
    ).fetchone()
    assert n == 100 and contaminated == 100  # benchmark == corpus: all flagged


@settings(max_examples=25, deadline=None)
@given(
    weights=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=60),
    capacity=st.integers(min_value=8, max_value=64),
)
def test_packing_invariants(weights, capacity):
    """Pure-fold invariants (the Spark stage runs this exact fold per shard,
    pinned by the differential test in test_curation_ops.py):
    - bins are contiguous from 0 and non-decreasing in doc order
    - no bin exceeds capacity unless it holds a single overfull doc
    - bin_fill is the running sum within the bin"""
    bin_id, fill = 0, 0
    per_bin = {}
    for j, w in enumerate(weights):
        if j == 0:
            fill = w
        elif fill + w <= capacity:
            fill += w
        else:
            bin_id, fill = bin_id + 1, w
        per_bin.setdefault(bin_id, []).append(w)
        assert fill == sum(per_bin[bin_id])
    assert sorted(per_bin) == list(range(bin_id + 1))
    for b, ws in per_bin.items():
        assert sum(ws) <= capacity or len(ws) == 1


def test_cli_chunk(docs_parquet, tmp_path):
    out = str(tmp_path / "chunks")
    assert _run_cli(
        ["chunk", "--input", docs_parquet, "--output", out,
         "--window", "16", "--overlap", "4"]
    ) == 0
    con = duckdb.connect()
    n, docs = con.execute(
        f"SELECT count(*), count(DISTINCT doc_id) FROM '{out}/*.parquet'"
    ).fetchone()
    assert docs == 100 and n > 100  # long docs multi-chunk at window=16
    mx = con.execute(f"SELECT max(n_words) FROM '{out}/*.parquet'").fetchone()[0]
    assert mx <= 16


def test_cli_dup_spans(docs_parquet, tmp_path):
    out = str(tmp_path / "spans")
    assert _run_cli(
        ["dup-spans", "--input", docs_parquet, "--output", out, "--ngram", "4"]
    ) == 0
    con = duckdb.connect()
    # every i%7==0 doc is the identical 8-word sentence -> full-doc spans
    rows = con.execute(
        f"SELECT count(*) FROM '{out}/*.parquet' WHERE span_start = 0 AND span_end = 7"
    ).fetchone()[0]
    assert rows >= 15


def test_cli_url_stats(tmp_path):
    src = str(tmp_path / "u.parquet")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT i AS doc_id,
               'text https://Site' || (i % 2)::VARCHAR || '.com/p' || i::VARCHAR AS text
             FROM generate_series(0, 9) t(i)) TO '{src}' (FORMAT PARQUET)"""
    )
    out = str(tmp_path / "domains")
    assert _run_cli(["url-stats", "--input", src, "--output", out]) == 0
    rows = dict(
        (d, n)
        for d, n, _ in con.execute(
            f"SELECT domain, n_urls, n_docs FROM '{out}/*.parquet'"
        ).fetchall()
    )
    assert rows == {"site0.com": 5, "site1.com": 5}
