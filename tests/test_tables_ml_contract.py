"""Contract test for the table-ML grid assembly against REAL recorded model
outputs (not the stub detector).

The fixture ``goldens/naic_page94_cells.json`` is the reference's recorded
table-transformers (DETR) structure-model output for
``evals/data/tables/naic-numerical-list-of-companies-page-94.pdf``
(reference ``src/tests/tables/transformers/test_ml.py:6-359``) — 25 table
rows, 7 columns, 1 column header, 1 spanning cell, 1 table box.  This proves
``table_from_model_outputs`` (B7) and the renderers (B9) behave correctly on
real model geometry, independent of whether torch is present.

Note: the reference's own test is disabled upstream and its stale comments
claim 26 rows / 25 row_objs; the actual fixture has 25 ``table row`` entries
(``is_row`` excludes spanning cells, reference ``schemas.py:30-32``), and one
of them is the header band itself, dropped by the >=90% header-overlap rule
(reference ``ml.py:301-318``) — hence 24 data rows.
"""

import hashlib
import json
import os

import pytest

from open_parse_spark.operators.tables_ml import (
    MIN_CELL_CONFIDENCE,
    TableCellModelOutput,
    table_from_model_outputs,
)

IMAGE_SIZE = (792, 612)
PAGE_SIZE = (792.0, 612.0)
TABLE_BBOX = (56.02, 180.17, 702.35, 460.68)

# frozen from the first assembly of the recorded outputs (empty-content grid;
# geometry-only, so any change to intersection/conversion/sorting breaks it)
HTML_SHA = "9872069f886b09cbe48d8dfc3ce386191f4b2a1a7b16476fed182aada67569f1"


@pytest.fixture(scope="module")
def recorded_cells():
    p = os.path.join(os.path.dirname(__file__), "goldens", "naic_page94_cells.json")
    with open(p) as f:
        return [
            TableCellModelOutput(label=label, confidence=conf, bbox=tuple(bbox))
            for label, conf, bbox in json.load(f)
        ]


def test_fixture_composition(recorded_cells):
    labels = [c.label for c in recorded_cells]
    assert labels.count("table row") == 25
    assert labels.count("table column") == 7
    assert labels.count("table column header") == 1
    assert labels.count("table spanning cell") == 1
    assert labels.count("table") == 1
    # every structural cell clears the confidence gate used in assembly
    structural = [c for c in recorded_cells if c.is_header or c.is_row or c.is_column]
    assert all(c.confidence > MIN_CELL_CONFIDENCE for c in structural)


def test_grid_assembly_from_real_model_outputs(recorded_cells):
    t = table_from_model_outputs(IMAGE_SIZE, PAGE_SIZE, TABLE_BBOX, recorded_cells)
    assert len(t.headers) == 1
    assert [len(h.cells) for h in t.headers] == [7]
    # 25 model rows -> 24 data rows: the header-band row is >=90% covered by
    # the column header and dropped
    assert len(t.rows) == 24
    assert {len(r.cells) for r in t.rows} == {7}
    # rows sorted top-to-bottom, cells left-to-right
    ys = [r.bbox[1] for r in t.rows]
    assert ys == sorted(ys)
    for r in t.rows:
        xs = [c.bbox[0] for c in r.cells]
        assert xs == sorted(xs)


def test_rendered_geometry_frozen(recorded_cells):
    t = table_from_model_outputs(IMAGE_SIZE, PAGE_SIZE, TABLE_BBOX, recorded_cells)
    html = t.to_html_str()
    assert hashlib.sha256(html.encode()).hexdigest() == HTML_SHA


def test_ocr_fill_then_render(recorded_cells):
    """B8 fill + B9 render over the real grid: word boxes placed at header
    cell interiors land in exactly those cells."""
    t = table_from_model_outputs(IMAGE_SIZE, PAGE_SIZE, TABLE_BBOX, recorded_cells)
    words = []
    for i, cell in enumerate(t.headers[0].cells):
        x0, y0, x1, y1 = cell.bbox
        words.append((f"H{i}", (x0 + 1, y0 + 1, x1 - 1, y1 - 1)))
    t.fill_content_from_words(words)
    assert [c.content for c in t.headers[0].cells] == [f"H{i}" for i in range(7)]
    assert t.to_str().splitlines()[1] == "| H0 | H1 | H2 | H3 | H4 | H5 | H6 |"
    # data cells got no words -> empty content everywhere
    assert all(c.content == "" for r in t.rows for c in r.cells)
