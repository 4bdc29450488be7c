"""Table-transformers grid assembly + geometry goldens.

Geometry cases ported from the reference's pytest suite
(``/root/reference/src/tests/tables/transformers/test_geometry.py``); grid
assembly exercised via the deterministic stub detector."""

import pytest

from open_parse_spark.operators.tables_ml import (
    StubTableDetector,
    Table,
    TableCell,
    CellRow,
    calc_bbox_intersection,
    calculate_area,
    convert_cropped_cords_to_full_img_cords,
    convert_img_cords_to_pdf_cords,
    adjust_bbox_with_padding,
    is_overlapping_with_headers,
    table_from_model_outputs,
)


def test_bbox_intersection_overlapping():
    assert calc_bbox_intersection((0, 0, 10, 10), (5, 5, 15, 15)) == (5, 5, 10, 10)


def test_bbox_intersection_disjoint_within_margin():
    # margin-expanded test passes but actual intersection is empty -> None
    assert calc_bbox_intersection((0, 0, 10, 10), (11, 11, 20, 20)) is None


def test_bbox_intersection_far_apart():
    assert calc_bbox_intersection((0, 0, 10, 10), (100, 100, 120, 120)) is None


def test_bbox_intersection_negative_margin_raises():
    with pytest.raises(ValueError):
        calc_bbox_intersection((0, 0, 1, 1), (0, 0, 1, 1), safety_margin=-1)


def test_bbox_intersection_zero_area_raises():
    with pytest.raises(ValueError):
        calc_bbox_intersection((0, 0, 0, 1), (0, 0, 1, 1))


def test_coordinate_transforms():
    assert convert_img_cords_to_pdf_cords((100, 100, 200, 200), (612, 792), (1224, 1584)) == (
        50.0,
        50.0,
        100.0,
        100.0,
    )
    out = convert_cropped_cords_to_full_img_cords(
        0.05, (110, 110), (10, 10, 60, 60), (100, 100, 400, 400)
    )
    assert out[0] == pytest.approx(105.0)
    assert adjust_bbox_with_padding((10, 10, 20, 20), 100, 100, 0.1) == (9, 9, 21, 21)


def test_grid_assembly_from_stub_detector():
    det = StubTableDetector(n_rows=2, n_cols=2, cell=100.0)
    tables = det.find_table_bboxes()
    assert len(tables) == 1 and tables[0].confidence > 0.75
    cells = det.find_cells()
    table = table_from_model_outputs(
        image_size=(200, 300),
        page_size=(200, 300),
        table_bbox=tables[0].bbox,
        table_cells=cells,
        min_cell_confidence=0.95,
    )
    # header row x 2 cols; 3 model rows minus the header-overlapped one
    assert len(table.headers) == 1
    assert len(table.headers[0].cells) == 2
    assert len(table.rows) == 2  # first row dropped: >=90% covered by header
    for row in table.rows:
        assert len(row.cells) == 2


def test_table_render_and_text_fill():
    header = CellRow(
        cells=[
            TableCell(bbox=(0, 0, 50, 10), variant="header"),
            TableCell(bbox=(50, 0, 100, 10), variant="header"),
        ]
    )
    row = CellRow(
        cells=[
            TableCell(bbox=(0, 10, 50, 20)),
            TableCell(bbox=(50, 10, 100, 20)),
        ]
    )
    table = Table(bbox=(0, 0, 100, 20), headers=[header], rows=[row])
    words = [
        ("Year", (5, 2, 20, 8)),
        ("Rev", (55, 2, 70, 8)),
        ("2022", (5, 12, 20, 18)),
        ("10", (55, 12, 65, 18)),
    ]
    table.fill_content_from_words(words)
    md = table.to_markdown_str()
    assert md.splitlines()[0] == "| Year | Rev |"
    assert "| 2022 | 10  |" in md
    html = table.to_html_str()
    assert html.startswith('<table border="1">')
    assert '<th style="min-width:50px;">Year</th>' in html
    s = table.to_str()
    assert s.splitlines()[0].startswith("+------")


def test_cells_sorted_by_y_then_x():
    # rows given out of order must sort by y, cells by (y, x)
    r1 = CellRow(cells=[TableCell(bbox=(50, 30, 100, 40)), TableCell(bbox=(0, 30, 50, 40))])
    r0 = CellRow(cells=[TableCell(bbox=(0, 10, 50, 20))])
    table = Table(bbox=(0, 0, 100, 40), headers=[], rows=[r1, r0])
    assert table.rows[0].cells[0].bbox[1] == 10
    assert table.rows[1].cells[0].bbox == (0, 30, 50, 40)
    assert table.rows[1].cells[1].bbox == (50, 30, 100, 40)


def test_is_overlapping_with_headers():
    headers = [CellRow(cells=[TableCell(bbox=(0, 0, 100, 10), variant="header")])]
    assert is_overlapping_with_headers((0, 0, 100, 10), headers) is True
    assert is_overlapping_with_headers((0, 50, 100, 60), headers) is False
    assert calculate_area(None) == 0
