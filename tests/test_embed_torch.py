"""Import-guarded real-model text-embedding path (operators/embed_torch.py):
the numpy pool-and-normalize adapter consumes the exact array shapes
``outputs.last_hidden_state.detach().cpu().numpy()`` hands over, so it is
fully testable without torch; the driver class must refuse to construct
here and the factory must fall back to the hashing stub unchanged (mirror
of tests/test_tables_torch.py — VERDICT r4 ask #4)."""

import math

import numpy as np
import pytest

from open_parse_spark.core.semantic import HashingEmbeddings
from open_parse_spark.operators.embed_torch import (
    TorchTextEmbedder,
    embed_documents,
    get_embedder,
    l2_normalize,
    mean_pool,
    pool_and_normalize,
    torch_text_available,
)

# recorded encoder output for a 2-text batch (B=2, T=4, H=3): text 0 has two
# real tokens + two padding positions; text 1 tokenized to nothing (all-pad)
RECORDED_HIDDEN = np.array(
    [
        [[1.0, 2.0, 3.0], [3.0, 2.0, 1.0], [9.0, 9.0, 9.0], [7.0, 7.0, 7.0]],
        [[5.0, 5.0, 5.0], [4.0, 4.0, 4.0], [3.0, 3.0, 3.0], [2.0, 2.0, 2.0]],
    ]
)
RECORDED_MASK = np.array([[1, 1, 0, 0], [0, 0, 0, 0]])


def test_mean_pool_masks_padding_and_zeroes_empty_rows():
    pooled = mean_pool(RECORDED_HIDDEN, RECORDED_MASK)
    # row 0: mean of the two REAL tokens only — padding rows (9s, 7s) ignored
    np.testing.assert_allclose(pooled[0], [2.0, 2.0, 2.0], atol=1e-12)
    # row 1: all-pad mask -> zero vector, never NaN
    np.testing.assert_allclose(pooled[1], [0.0, 0.0, 0.0], atol=1e-12)


def test_l2_normalize_unit_rows_and_zero_rows():
    out = l2_normalize(np.array([[3.0, 4.0], [0.0, 0.0]]))
    np.testing.assert_allclose(out[0], [0.6, 0.8], atol=1e-12)
    np.testing.assert_allclose(out[1], [0.0, 0.0], atol=1e-12)


def test_pool_and_normalize_end_to_end_recorded_batch():
    vecs = pool_and_normalize(RECORDED_HIDDEN, RECORDED_MASK)
    inv_sqrt3 = 1.0 / math.sqrt(3.0)
    np.testing.assert_allclose(vecs[0], [inv_sqrt3] * 3, atol=1e-12)
    np.testing.assert_allclose(vecs[1], [0.0] * 3, atol=1e-12)
    # unit norm for the non-empty row
    assert abs(float(np.linalg.norm(vecs[0])) - 1.0) < 1e-12


def test_adapter_rejects_wrong_shapes():
    with pytest.raises(ValueError):
        mean_pool(np.zeros((2, 4)), np.zeros((2, 4)))


def test_driver_refuses_without_torch_and_factory_falls_back():
    if torch_text_available():
        pytest.skip("torch present: the real path is live in this env")
    with pytest.raises(ImportError):
        TorchTextEmbedder()
    emb = get_embedder(dim=32)
    assert isinstance(emb, HashingEmbeddings)
    got = emb.embed_many(["alpha beta", ""])
    assert len(got) == 2 and len(got[0]) == 32
    assert got[1] == [0.0] * 32  # empty-text zero-vector contract


def test_embed_documents_spark_stage_matches_driver_contract(spark):
    """The mapInPandas stage must emit exactly what the factory embedder
    says, row-aligned by id, zero-shuffle, empty/NULL texts -> zero vecs."""
    rows = [
        (0, "the quick brown fox"),
        (1, ""),
        (2, None),
        (3, "the quick brown fox"),  # same text -> same vector (determinism)
        (4, "another document entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["embedding"])
        for r in embed_documents(df, prefer_torch=False, dim=16).collect()
    }
    want_vecs = HashingEmbeddings(dim=16).embed_many(
        ["" if t is None else t for _, t in rows]
    )
    for (doc_id, _), want in zip(rows, want_vecs):
        assert got[doc_id] == [float(x) for x in want], doc_id
    assert got[0] == got[3]
    assert got[1] == [0.0] * 16 and got[2] == [0.0] * 16
    # plan shape: map-only
    plan = (
        embed_documents(df, prefer_torch=False, dim=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
