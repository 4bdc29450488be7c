"""Unitable (B10) pure-utility goldens.

``goldens/unitable_preds.json`` carries the reference's 20 recorded unitable
structure-model predictions (``src/tests/tables/unitable/
sample_pred_outputs.py`` — mini_pubtabnet/val images) plus the row structure
of the reference pipeline's own assembled ``core_html``.  The cell-content
model's OCR occasionally returns fewer cells than the structure predicts, and
the reference's rebuild DROPS fill-cells once content is exhausted
(``utils.py:128-130``) — so core rows can only be shorter than the structure,
never longer; 9 of 20 samples had complete content and match exactly.
"""

import json
import os
import re

import pytest

from open_parse_spark.functions.unitable import (
    bbox_str_to_token_list,
    build_table_from_html_and_cell,
    cell_str_to_token_list,
    clean_cell_text,
    html_str_to_token_list,
    html_table_template,
    rebuild_table_html,
)

EXACT_MATCH_SAMPLES = {2, 3, 4, 6, 8, 11, 12, 14, 18}


def _structure_of(html):
    rows = re.findall(r"<tr>(.*?)</tr>", html, flags=re.S)
    return [len(re.findall(r"<t[dh][^>]*>.*?</t[dh]>", r, flags=re.S)) for r in rows]


@pytest.fixture(scope="module")
def recorded_preds():
    p = os.path.join(os.path.dirname(__file__), "goldens", "unitable_preds.json")
    with open(p) as f:
        return json.load(f)


def test_rebuild_structure_vs_reference_outputs(recorded_preds):
    assert len(recorded_preds) == 20
    exact = set()
    for idx, sample in enumerate(recorded_preds):
        rebuilt = "".join(build_table_from_html_and_cell(sample["pred_html"]))
        rs, cs = _structure_of(rebuilt), sample["core_structure"]
        # row count is decode-determined: always identical
        assert len(rs) == len(cs), idx
        # content exhaustion can only shorten rows
        assert all(a >= b for a, b in zip(rs, cs)), idx
        if rs == cs:
            exact.add(idx)
    assert exact == EXACT_MATCH_SAMPLES


def test_build_fill_and_exhaustion():
    structure = ["<thead>", "<tr>", "<td>[]</td>", "<td></td>", ">[]</td>", "</tr>", "</thead>"]
    # explicit content, exhausted after one cell: second fill-cell DROPPED
    assert build_table_from_html_and_cell(structure, ["A"]) == [
        "<thead>", "<tr>", "<td>A</td>", "<td></td>", "</tr>", "</thead>"
    ]
    # content=None -> placeholder everywhere, nothing dropped
    assert build_table_from_html_and_cell(structure) == [
        "<thead>", "<tr>", "<td>placeholder</td>", "<td></td>",
        ">placeholder</td>", "</tr>", "</thead>"
    ]
    # input content list is not mutated (reference copies)
    content = ["A", "B"]
    build_table_from_html_and_cell(structure, content)
    assert content == ["A", "B"]


def test_html_str_to_token_list_quirks():
    # task token [html] survives (reference blacklists only <eos>/<pad>)
    seq = "[html] <thead> <tr> <td>[]</td> </tr> </thead> <eos> <tr>"
    assert html_str_to_token_list(seq) == [
        "[html]", "<thead>", "<tr>", "<td>[]</td>", "</tr>", "</thead>"
    ]
    # single-ORIGINAL-character tokens are dropped by filter_tokens
    assert html_str_to_token_list("<tr> x </tr>") == ["<tr>", "</tr>"]
    # <pad> removal can weld neighbours into one token, spans included
    assert html_str_to_token_list("<tr><pad></tr>") == ["<tr></tr>"]


def test_cell_str_cleanup_and_decimal_fix():
    assert cell_str_to_token_list("[cell] 3. 14 <eos><pad>garbage") == "3. 14"
    assert clean_cell_text("3. 14") == "3.14"
    # reference regex quirk: the unescaped '.' matches ANY separator char
    assert clean_cell_text("3, 14") == "3.14"
    assert clean_cell_text("no digits here") == "no digits here"


def test_bbox_str_to_token_list():
    assert bbox_str_to_token_list("bbox-1 bbox-4 bbox-80 bbox-13 bbox-99 <eos>") == [
        (1, 4, 80, 13)  # trailing partial box truncated
    ]
    assert bbox_str_to_token_list("<eos>") == []


def test_rebuild_table_html_end_to_end():
    structure = ["<tbody>", "<tr>", "<td>[]</td>", "</tr>", "</tbody>"]
    html = rebuild_table_html(structure, ["3. 14"])
    assert "<td>3.14</td>" in html
    assert html == html_table_template("<tbody><tr><td>3.14</td></tr></tbody>")
    assert html.startswith("<html>")
