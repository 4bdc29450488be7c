"""PageRank operator: exact equality vs an independent dict-based replay of
the declared integer fixed-point recurrence, plus structural properties
(dangling mass drop, determinism across partitionings).  The sf0.01 oracle
gate covers the corpus-level registry query (`domain_pagerank`)."""

import pytest

from open_parse_spark.operators.graph import pagerank


def _replay(edges, iterations, num=85, den=100, scale=10**12):
    """Independent reference: plain-Python replay of the documented
    recurrence (no Spark, no SQL)."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    init = scale // n
    teleport = ((den - num) * scale) // (den * n)
    rank = {v: init for v in nodes}
    for _ in range(iterations):
        inc = {v: 0 for v in nodes}
        for s, d in e:
            inc[d] += rank[s] // outdeg[s]
        rank = {v: teleport + (num * inc[v]) // den for v in nodes}
    return rank


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "e"),  # e is dangling (no out-edges)
    ("a", "b"),  # duplicate edge must collapse
]


def test_pagerank_matches_independent_replay(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=5).collect()}
    assert got == _replay(EDGES, iterations=5)


def test_pagerank_partitioning_invariant(spark):
    """Integer arithmetic -> bit-identical ranks regardless of layout."""
    df1 = spark.createDataFrame(EDGES, "src string, dst string").repartition(1)
    df7 = spark.createDataFrame(EDGES, "src string, dst string").repartition(7)
    r1 = sorted(map(tuple, pagerank(df1, iterations=4).collect()))
    r7 = sorted(map(tuple, pagerank(df7, iterations=4).collect()))
    assert r1 == r7


def test_pagerank_dangling_mass_drops(spark):
    """With a dangling sink, total mass strictly decreases from the initial
    `scale` (the documented drop-dangling-mass variant)."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    ranks = [r["rank"] for r in pagerank(df, iterations=5).collect()]
    assert 0 < sum(ranks) < 10**12


def test_pagerank_zero_iterations_and_validation(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=0).collect()}
    n = 5
    assert set(got.values()) == {10**12 // n}
    with pytest.raises(ValueError):
        pagerank(df, iterations=-1)
