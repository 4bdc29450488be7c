"""Chunking + URL ops (round 3): invariants the sf-gate's value equality
can't express — chunk coverage/overlap/reassembly, and Java-vs-RE2 dialect
parity for the URL pattern on crafted hostile strings (the corpus-level
oracle already pins engine equality on injected URLs)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from open_parse_spark.functions.text import URL_RE, extract_urls, url_domain
from open_parse_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "one two three four five six seven eight nine ten"),
        (1, "single"),
        (2, " ".join(f"w{i}" for i in range(100))),
        (3, ""),           # zero words -> zero chunks
        (4, None),         # NULL text -> zero chunks
        (5, "...!!!"),     # no word chars -> zero chunks
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_coverage_and_overlap(docs):
    out = chunk_documents(docs, window=6, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {0, 1, 2}  # empty/NULL/punct docs chunkless
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        words_lists = [c["chunk_text"].split(" ") for c in chunks]
        for c, wl in zip(chunks, words_lists):
            assert c["n_words"] == len(wl) <= 6
        # every full-width chunk starts with the previous chunk's last
        # `overlap` words (stride walk)
        for a, b in zip(words_lists, words_lists[1:]):
            assert b[:2] == a[4:6], (doc_id, a, b)
    # exact reassembly check on doc 2 (100 words)
    wl2 = [c["chunk_text"].split(" ") for c in sorted(by_doc[2], key=lambda r: r["chunk_idx"])]
    rebuilt = wl2[0] + [w for wl in wl2[1:] for w in wl[2:]]
    assert rebuilt == [f"w{i}" for i in range(100)]


def test_chunk_single_window_doc(docs):
    out = {
        r["doc_id"]: r
        for r in chunk_documents(docs, window=128, overlap=32).collect()
    }
    assert out[0]["n_words"] == 10 and out[0]["chunk_idx"] == 0
    assert out[1]["chunk_text"] == "single"
    assert len(out) == 3


def test_chunk_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, window=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=8, overlap=-1)


HOSTILE_URLS = [
    "plain text no urls",
    "see https://Example.COM/Path?a=1&b=%20#frag end",
    "multi http://a.b.c/x https://d.e/y;z='q'(r)*s,t end",
    "tight(https://paren.com/inside)after",
    "unicode café https://host.com/café-path stops-at-unicode",
    "trailing dot https://dot.com/path. and comma https://c.om/p, done",
    "no scheme www.nope.com ftp://also.no",
    "uppercase HTTPS://UPPER.COM/X is not matched (case-exact scheme)",
    "userinfo https://user@host.com/x and http://u:pw@sec.org/y done",
    "path-side at https://site.com/a@b must still key on the host",
]


def test_url_dialect_parity_spark_vs_duckdb(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(HOSTILE_URLS)], "i long, text string"
    )
    got = {
        (r["i"], r["pos"]): (r["url"], r["domain"])
        for r in df.select(
            "i", F.posexplode(extract_urls(F.col("text"))).alias("pos", "url")
        ).select("i", "pos", "url", url_domain(F.col("url")).alias("domain")).collect()
    }
    from open_parse_spark.functions.text import _DOMAIN_RE

    con = duckdb.connect()
    pat = URL_RE.replace("'", "''")
    dom_pat = _DOMAIN_RE.replace("'", "''")  # SQL-quote escape, like pat
    want = {}
    for i, t in enumerate(HOSTILE_URLS):
        urls = con.execute(
            f"SELECT regexp_extract_all(?, '{pat}')", [t]
        ).fetchone()[0]
        for pos, u in enumerate(urls):
            dom = con.execute(
                f"SELECT lower(regexp_extract(?, '{dom_pat}', 1))",
                [u],
            ).fetchone()[0]
            want[(i, pos)] = (u, dom)
    assert got == want
    # INDEPENDENT semantic checks (not just engine parity — a bug shared by
    # both engines would pass the parity assert; review finding):
    import re as _re

    strict = _re.compile(r"^[a-z0-9-]+(\.[a-z0-9-]+)*$")
    for (i, pos), (u, dom) in got.items():
        assert strict.match(dom), f"malformed domain {dom!r} from {u!r}"
        assert not u[-1] in ".,;:!?'", f"URL kept trailing punctuation: {u!r}"
        assert u.startswith(("http://", "https://"))
    assert got[(1, 0)][1] == "example.com"
    assert all(k[0] != 6 and k[0] != 7 for k in got), "scheme must be exact-case http(s)"
    # userinfo URLs key on the HOST, not the user part (ADVICE r3 finding);
    # a path-side '@' must not re-trigger the userinfo skip
    assert got[(8, 0)][1] == "host.com", got[(8, 0)]
    assert got[(8, 1)][1] == "sec.org", got[(8, 1)]
    assert got[(9, 0)][1] == "site.com", got[(9, 0)]


def test_rag_index_composition(spark):
    """Composed chunk->embed->LSH-bucket query: one row per chunk, buckets
    in [0, 16), exact integer arithmetic => partitioning-invariant."""
    from open_parse_spark.plans.queries import q_doc_chunks, q_rag_index

    sf = "/root/testdata/sf0.001"
    out = q_rag_index(spark, sf).collect()
    n_chunks = q_doc_chunks(spark, sf).count()
    assert len(out) == n_chunks
    assert all(0 <= r["bucket"] < 16 for r in out)
    # buckets spread (not degenerate): more than 4 distinct values in use
    assert len({r["bucket"] for r in out}) > 4
    again = {(r["doc_id"], r["chunk_idx"]): r["bucket"] for r in out}
    rerun = {
        (r["doc_id"], r["chunk_idx"]): r["bucket"]
        for r in q_rag_index(spark, sf).collect()
    }
    assert again == rerun


def test_chunking_hypothesis_vs_python_reference(spark):
    """Property: for random word counts and (window, overlap) configs, the
    Spark chunking equals a direct python replay of the contract, and the
    coverage/overlap invariants hold."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from open_parse_spark.operators.chunking import chunk_documents

    def python_chunks(n, window, overlap):
        stride = window - overlap
        if n == 0:
            return []
        n_chunks = 1 if n <= overlap else -(-(n - overlap) // stride)
        out = []
        for i in range(n_chunks):
            ws = list(range(n))[i * stride : i * stride + window]
            out.append((i, len(ws), ws))
        return out

    @settings(max_examples=15, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=60),
        window=st.integers(min_value=2, max_value=20),
        overlap_frac=st.floats(min_value=0.0, max_value=0.9),
    )
    def check(n, window, overlap_frac):
        overlap = int(window * overlap_frac)
        text = " ".join(f"w{i}" for i in range(n))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = sorted(
            (r["chunk_idx"], r["n_words"], r["chunk_text"].split(" "))
            for r in chunk_documents(df, window=window, overlap=overlap).collect()
        )
        want = [
            (i, nw, [f"w{j}" for j in ws])
            for i, nw, ws in python_chunks(n, window, overlap)
        ]
        assert got == want, (n, window, overlap, got, want)
        # coverage: every word index appears in at least one chunk
        covered = {w for _, _, ws in got for w in ws}
        assert covered == {f"w{i}" for i in range(n)}

    check()


def test_chunk_merge_semantic_invariants(spark):
    """Greedy semantic merge: groups partition the chunk sequence in order,
    word/chunk totals are conserved, and similar adjacent chunks merge while
    dissimilar ones do not."""
    from open_parse_spark.operators.chunking import (
        chunk_documents,
        merge_chunks_semantic,
    )

    rows = [
        # doc 1: the same 6 words repeated -> adjacent chunks near-identical
        (1, " ".join(["apple banana cherry date elder fig"] * 6)),
        # doc 2: disjoint vocab per window -> no merges
        (2, " ".join(f"uniq{i}a uniq{i}b uniq{i}c uniq{i}d" for i in range(9))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    window, overlap = 12, 4
    chunks = chunk_documents(df, window=window, overlap=overlap).collect()
    groups = merge_chunks_semantic(
        df, window=window, overlap=overlap, num_sq=1, den_sq=4, max_words=24
    ).collect()
    by_doc_chunks = {}
    for r in chunks:
        by_doc_chunks.setdefault(r["doc_id"], []).append(r)
    by_doc_groups = {}
    for r in groups:
        by_doc_groups.setdefault(r["doc_id"], []).append(r)
    for doc in (1, 2):
        gs = sorted(by_doc_groups[doc], key=lambda r: r["group_idx"])
        assert [g["group_idx"] for g in gs] == list(range(len(gs)))
        assert sum(g["n_chunks"] for g in gs) == len(by_doc_chunks[doc])
        assert sum(g["n_words"] for g in gs) == sum(
            c["n_words"] for c in by_doc_chunks[doc]
        )
    # doc 1 merges (repeated vocab, cap 24 words = 2 chunks/group);
    # doc 2 never merges (disjoint vocab -> cosine ~ 0)
    assert any(g["n_chunks"] >= 2 for g in by_doc_groups[1])
    assert all(g["n_chunks"] == 1 for g in by_doc_groups[2]), by_doc_groups[2]


def test_chunk_merge_empty_and_single(spark):
    from open_parse_spark.operators.chunking import merge_chunks_semantic

    df = spark.createDataFrame(
        [(1, "just four words here"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = merge_chunks_semantic(df, window=8, overlap=2).collect()
    assert len(out) == 1
    assert (out[0]["doc_id"], out[0]["group_idx"], out[0]["n_chunks"],
            out[0]["n_words"]) == (1, 0, 1, 4)


def test_chunk_merge_non_default_id_col(spark):
    # chunk_documents aliases the id column to doc_id; grouping by the
    # caller's original name crashed for any non-default id_col — review
    # finding
    from open_parse_spark.operators.chunking import merge_chunks_semantic

    df = spark.createDataFrame(
        [(7, "a few plain words in a row here")], "page_id long, text string"
    )
    out = merge_chunks_semantic(df, window=8, overlap=2, id_col="page_id").collect()
    assert len(out) == 1 and out[0]["doc_id"] == 7 and out[0]["n_words"] == 8


def test_chunk_span_offsets_recover_source(spark):
    """span_start/span_end are 0-based char offsets into the SOURCE text
    (VERDICT r3): the substring runs exactly from the first char of the
    chunk's first word to the last char of its last word, so re-tokenizing
    it yields the chunk's word list verbatim — on punctuation-heavy,
    unicode-separated and leading/trailing-junk docs."""
    import re

    rows = [
        (1, "  ...Hello, WORLD!  (this)   is--a test;  café naïve 'end'.  "),
        (2, "a" * 30 + " " + "b2b " * 40 + "tail"),
        (3, "söz1ötesi words held apart by ünïcode séparators okay"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = dict(rows)
    out = chunk_documents(df, window=5, overlap=2).collect()
    assert out, "no chunks"
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        prev_start = -1
        for r in chunks:
            sub = src[doc_id][r["span_start"] : r["span_end"]]
            # word-char boundaries on both ends
            assert re.match(r"[A-Za-z0-9]", sub[0]), (doc_id, sub)
            assert re.match(r"[A-Za-z0-9]", sub[-1]), (doc_id, sub)
            # re-tokenizing the substring gives the chunk words verbatim
            got_words = [w.lower() for w in re.findall(r"[A-Za-z0-9]+", sub)]
            assert got_words == r["chunk_text"].split(" "), (doc_id, sub)
            # spans walk forward with the stride
            assert r["span_start"] > prev_start
            prev_start = r["span_start"]
