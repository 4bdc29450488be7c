"""Unitable autoregressive decode loop (operators/unitable_torch.py): the
numpy loop consumes the exact (B, V) last-position logits the torch forward
hands over, so every control-flow branch is testable without torch via
scripted step functions; the driver class must refuse to construct here
(mirror of tests/test_tables_torch.py — closes the r4 B10 decode gap at its
testable surface)."""

import numpy as np
import pytest

from open_parse_spark.operators.unitable_torch import (
    UnitableExtractor,
    autoregressive_decode,
    decoded_to_table_html,
    greedy_sampling_np,
    ids_to_str,
    pred_token_within_range_np,
    rescale_bbox,
    subsequent_mask_np,
    torch_unitable_available,
)

# a tiny decode vocabulary: 0=<eos>, 1..4 content tokens
EOS = 0


def _script_step(script):
    """step_fn replaying a per-row token script: at step t, row b's scripted
    token gets logit 10, everything else 0 (rows past their script end keep
    emitting their last token).  Records received contexts for assertions."""
    calls = []

    def step(context):
        t = context.shape[1] - 1  # tokens appended so far
        calls.append(context.copy())
        logits = np.zeros((context.shape[0], 5))
        for b, row_script in enumerate(script):
            tok = row_script[min(t, len(row_script) - 1)]
            logits[b, tok] = 10.0
        return logits

    step.calls = calls
    return step


def test_loop_replays_script_and_stops_on_all_eos():
    step = _script_step([[1, 2, EOS], [3, 3, 3, EOS]])
    out = autoregressive_decode(
        step, batch_size=2, prefix=[4], max_decode_len=50, eos_id=EOS
    )
    # row 0 finishes at step 3 but KEEPS extending (reference core.py:95-97
    # checks all-rows-have-eos at loop top) until row 1's eos lands at step 4
    assert out.tolist() == [[4, 1, 2, EOS, EOS], [4, 3, 3, 3, EOS]]
    # the loop saw the growing context each step (prefix first)
    assert [c.shape[1] for c in step.calls] == [1, 2, 3, 4]


def test_loop_caps_at_max_decode_len_without_eos():
    step = _script_step([[1], [2]])  # never emits eos
    out = autoregressive_decode(
        step, batch_size=2, prefix=[4], max_decode_len=7, eos_id=EOS
    )
    assert out.shape == (2, 8)  # prefix + exactly max_decode_len tokens
    assert out[0].tolist() == [4] + [1] * 7


def test_whitelist_redirects_greedy_choice():
    # script wants token 1, whitelist bans it -> the best ALLOWED token wins
    def step(context):
        logits = np.zeros((1, 5))
        logits[0, 1] = 10.0
        logits[0, 2] = 5.0
        logits[0, EOS] = 1.0
        return logits

    out = autoregressive_decode(
        step, 1, prefix=[4], max_decode_len=3, eos_id=EOS,
        token_whitelist=[2, EOS],
    )
    assert out[0, 1] == 2  # not the banned 1
    # blacklist form of the same constraint
    out_b = autoregressive_decode(
        step, 1, prefix=[4], max_decode_len=3, eos_id=EOS,
        token_blacklist=[1, 3, 4],
    )
    assert out_b[0, 1] == 2
    with pytest.raises(AssertionError):
        pred_token_within_range_np(np.zeros((1, 5)), [1], [2])  # both lists


def test_masking_and_greedy_primitives():
    logits = np.array([[3.0, 2.0, 1.0, 0.0, -1.0]])
    masked = pred_token_within_range_np(logits, white_list=[1, 3])
    assert masked[0, 0] == -np.inf and masked[0, 1] == 2.0
    probs, ids = greedy_sampling_np(masked)
    assert ids.tolist() == [1] and 0 < probs[0] <= 1
    # original array untouched (reference mutates; the numpy twin copies)
    assert logits[0, 0] == 3.0
    m = subsequent_mask_np(4, pad=2)
    assert not m[:2].any() and m[2, 3] and not m[3, 2]


def test_bbox_rescale_matches_reference_rounding():
    # reference core.py:56-74: per-coordinate round after ratio scaling
    got = rescale_bbox([(10, 20, 100, 200)], src=(448, 448), tgt=(900, 450))
    assert got == [(20, 20, 201, 201)]


def test_decoded_ids_rebuild_reference_table_html():
    """End-to-end downstream of the decode: scripted structure + cell id
    streams -> the golden-tested token cleanup + rebuild -> full document
    HTML.  The structure stream carries the reference's surviving task
    token quirk; the cell streams carry <eos> tails and a split decimal."""
    s_vocab = {
        0: "[html]", 1: "<thead>", 2: "</thead>", 3: "<tbody>", 4: "</tbody>",
        5: "<tr>", 6: "</tr>", 7: "<td>[]</td>", 8: "<eos>",
    }
    c_vocab = {0: "[cell]", 1: "Year", 2: "Rev", 3: "3.", 4: "5", 5: "<eos>"}
    structure_ids = [0, 1, 5, 7, 7, 6, 2, 3, 5, 7, 7, 6, 4, 8]
    cell_ids = [[0, 1, 5], [0, 2, 5], [0, 3, 4, 5]]  # "3. 5" -> "3.5"
    html = decoded_to_table_html(structure_ids, cell_ids, s_vocab, c_vocab)
    assert "<td>Year</td>" in html and "<td>Rev</td>" in html
    assert "<td>3.5</td>" in html  # clean_cell_text decimal re-join
    # 4 fill cells but 3 decoded cells: the reference DROPS the trailing
    # fill (build_table_from_html_and_cell's continue) — bug-compatible
    assert html.count("<td>") == 3
    assert '<table frame="hsides" rules="groups" width="100%%">' in html


def test_driver_refuses_without_torch():
    if torch_unitable_available():
        pytest.skip("torch present: the real path is live in this env")
    with pytest.raises(ImportError):
        UnitableExtractor({"structure": ("x.pt", "v.json")})
