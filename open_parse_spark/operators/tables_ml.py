"""Table-transformers-style table structure extraction (B4-B11), rebuilt
without torch.

Reference: ``/root/reference/src/openparse/tables/table_transformers/``
(geometry.py, ml.py, schemas.py) and ``tables/utils.py``.

The two ML models (detection + structure, ml.py:58-83) are the only
non-deterministic pieces; they are behind the ``TableDetector`` protocol with
a deterministic ``StubTableDetector`` for this environment (torch is not
installed) — mirroring how the reference loads models once per process and
treats them as black boxes producing ``(label, confidence, bbox)`` outputs.
Everything downstream of the models — margin-expanded intersection (B6),
header x column / row x column grid assembly with the >=90%-header-overlap
drop rule (B7), rect-containment text fill (B8), y/x cell sorting and the
three renderers (B9), and the coordinate transforms (B11) — is exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

BBox = Tuple[float, float, float, float]
Size = Tuple[int, int]


# ---------------------------------------------------------------------------
# B6: geometry — reference geometry.py:4-41
# ---------------------------------------------------------------------------


def calc_bbox_intersection(
    bbox1: BBox, bbox2: BBox, safety_margin: float = 5.0
) -> Optional[BBox]:
    if safety_margin < 0:
        raise ValueError("Safety margin cannot be negative.")
    if (
        bbox1[2] <= bbox1[0]
        or bbox1[3] <= bbox1[1]
        or bbox2[2] <= bbox2[0]
        or bbox2[3] <= bbox2[1]
    ):
        raise ValueError("Bounding boxes must have non-zero width and height.")

    x1_expanded_min = min(bbox1[0], bbox2[0]) - safety_margin
    y1_expanded_min = min(bbox1[1], bbox2[1]) - safety_margin
    x2_expanded_max = max(bbox1[2], bbox2[2]) + safety_margin
    y2_expanded_max = max(bbox1[3], bbox2[3]) + safety_margin

    if (
        x2_expanded_max <= max(bbox1[0], bbox2[0])
        or x1_expanded_min >= min(bbox1[2], bbox2[2])
        or y2_expanded_max <= max(bbox1[1], bbox2[1])
        or y1_expanded_min >= min(bbox1[3], bbox2[3])
    ):
        return None

    x1 = max(bbox1[0], bbox2[0])
    y1 = max(bbox1[1], bbox2[1])
    x2 = min(bbox1[2], bbox2[2])
    y2 = min(bbox1[3], bbox2[3])
    if x2 > x1 and y2 > y1:
        return (x1, y1, x2, y2)
    return None


def calculate_area(bbox: Optional[BBox]) -> float:
    """Reference ml.py:293-298."""
    if bbox is None:
        return 0
    return (bbox[2] - bbox[0]) * (bbox[3] - bbox[1])


# ---------------------------------------------------------------------------
# B11: coordinate transforms — reference tables/utils.py:118-197
# ---------------------------------------------------------------------------


def convert_img_cords_to_pdf_cords(
    bbox: BBox, page_size: Size, image_size: Size
) -> BBox:
    scale_x = page_size[0] / image_size[0]
    scale_y = page_size[1] / image_size[1]
    return (bbox[0] * scale_x, bbox[1] * scale_y, bbox[2] * scale_x, bbox[3] * scale_y)


def convert_cropped_cords_to_full_img_cords(
    padding_pct: float, cropped_image_size: Size, table_bbox: BBox, bbox: BBox
) -> BBox:
    cropped_width, cropped_height = cropped_image_size
    width_without_padding = cropped_width / (1 + 2 * padding_pct)
    height_without_padding = cropped_height / (1 + 2 * padding_pct)
    padding_x = (cropped_width - width_without_padding) / 2
    padding_y = (cropped_height - height_without_padding) / 2
    left, top, right, bottom = table_bbox
    orig_left, orig_top, _, _ = bbox
    return (
        left - padding_x + orig_left,
        top - padding_y + orig_top,
        right - padding_x + orig_left,
        bottom - padding_y + orig_top,
    )


def adjust_bbox_with_padding(
    bbox: BBox, page_width: float, page_height: float, padding_pct: float
) -> BBox:
    x0, y0, x1, y1 = bbox
    padding_x = (x1 - x0) * padding_pct
    padding_y = (y1 - y0) * padding_pct
    return (
        max(x0 - padding_x, 0),
        max(y0 - padding_y, 0),
        min(x1 + padding_x, page_width),
        min(y1 + padding_y, page_height),
    )


# ---------------------------------------------------------------------------
# model output / cell schemas — reference table_transformers/schemas.py
# ---------------------------------------------------------------------------


@dataclass
class TableCellModelOutput:
    """Reference schemas.py:14-36 (labels from the structure model)."""

    label: str
    confidence: float
    bbox: BBox  # image coordinates

    @property
    def is_header(self) -> bool:
        return self.label in ("table column header", "table projected row header")

    @property
    def is_row(self) -> bool:
        return self.label == "table row"

    @property
    def is_column(self) -> bool:
        return self.label == "table column"


@dataclass
class TableModelOutput:
    """Reference schemas.py:39-42 (detection model output)."""

    label: str
    confidence: float
    bbox: BBox


def _round_bbox(bbox: BBox) -> BBox:
    # cells round to 0dp (reference schemas.py:50-54,61-64)
    return tuple(round(c, 0) for c in bbox)


@dataclass
class TableCell:
    """Header or data cell; reference schemas.py:45-64."""

    bbox: BBox
    content: Optional[str] = None
    variant: str = "data"

    def __post_init__(self):
        self.bbox = _round_bbox(self.bbox)


@dataclass
class CellRow:
    """_TableHeader/_TableRow; reference schemas.py:67-94."""

    cells: List[TableCell] = field(default_factory=list)

    def sort_cells(self) -> None:
        self.cells.sort(key=lambda cell: (cell.bbox[1], cell.bbox[0]))

    @property
    def bbox(self) -> BBox:
        return (
            min(c.bbox[0] for c in self.cells),
            min(c.bbox[1] for c in self.cells),
            max(c.bbox[2] for c in self.cells),
            max(c.bbox[3] for c in self.cells),
        )


class Table:
    """_Table: sorted grid + renderers; reference schemas.py:97-273."""

    def __init__(self, bbox: BBox, headers: List[CellRow], rows: List[CellRow]):
        self.bbox = _round_bbox(bbox)
        # sort at construction (reference schemas.py:111-126)
        self.headers = sorted(headers, key=lambda h: h.bbox[1])
        self.rows = sorted(rows, key=lambda r: r.bbox[1])
        for header in self.headers:
            header.sort_cells()
        for row in self.rows:
            row.sort_cells()

    def _calc_col_widths(self) -> List[int]:
        return [
            max(len(cell.content or "") for cell in column)
            for column in zip(
                *[h.cells for h in self.headers] + [r.cells for r in self.rows]
            )
        ]

    def _row_str(self, cells: Sequence[TableCell], widths: List[int]) -> str:
        row_content = "|".join(
            " {} ".format(cell.content.ljust(width) if cell.content else " " * width)
            for cell, width in zip(cells, widths)
        )
        return f"|{row_content}|"

    def _border_str(self, widths: List[int]) -> str:
        return "+" + "+".join("-" * (w + 2) for w in widths) + "+"

    def fill_content_from_words(
        self, words: Sequence[Tuple[str, BBox]]
    ) -> None:
        """B8 ``_run_ocr`` analog (reference schemas.py:170-179): fill each
        cell's content with the text whose boxes fall inside the cell rect —
        a spatial containment join, fed from structured word boxes instead of
        ``fitz.Page.get_textbox``."""
        for row in self.headers + self.rows:
            for cell in row.cells:
                x0, y0, x1, y1 = cell.bbox
                hits = [
                    w
                    for w, (wx0, wy0, wx1, wy1) in words
                    if wx0 >= x0 and wx1 <= x1 and wy0 >= y0 and wy1 <= y1
                ]
                cell.content = " ".join(hits)

    def to_str(self) -> str:
        widths = self._calc_col_widths()
        out = self._border_str(widths) + "\n"
        for header in self.headers:
            out += self._row_str(header.cells, widths) + "\n"
            out += self._border_str(widths) + "\n"
        for row in self.rows:
            out += self._row_str(row.cells, widths) + "\n"
            out += self._border_str(widths) + "\n"
        return out.rstrip()

    def to_html_str(self) -> str:
        html_str = '<table border="1">\n'
        if self.headers:
            html_str += "<thead>\n"
            for header in self.headers:
                html_str += "<tr>\n"
                for cell in header.cells:
                    min_width = round(cell.bbox[2] - cell.bbox[0])
                    html_str += (
                        f'<th style="min-width:{min_width}px;">'
                        f'{cell.content or ""}</th>\n'
                    )
                html_str += "</tr>\n"
            html_str += "</thead>\n"
        html_str += "<tbody>\n"
        for row in self.rows:
            html_str += "<tr>\n"
            for cell in row.cells:
                min_width = round(cell.bbox[2] - cell.bbox[0])
                html_str += (
                    f'<td style="min-width:{min_width}px;">{cell.content or ""}</td>\n'
                )
            html_str += "</tr>\n"
        html_str += "</tbody>\n</table>"
        return html_str

    def to_markdown_str(self) -> str:
        widths = self._calc_col_widths()
        out = ""
        if self.headers:
            for header in self.headers:
                out += (
                    "| "
                    + " | ".join(
                        cell.content.ljust(w) if cell.content else " " * w
                        for cell, w in zip(header.cells, widths)
                    )
                    + " |\n"
                )
                out += "|:" + ":|:".join("-" * w for w in widths) + ":|\n"
        for row in self.rows:
            out += (
                "| "
                + " | ".join(
                    cell.content.ljust(w) if cell.content else " " * w
                    for cell, w in zip(row.cells, widths)
                )
                + " |\n"
            )
        return out.rstrip()


# ---------------------------------------------------------------------------
# B7: grid assembly — reference ml.py:208-318
# ---------------------------------------------------------------------------


def preprocess_header_cells(
    header_rows: List[TableCellModelOutput],
    cols: List[TableCellModelOutput],
    image_size: Size,
    page_size: Size,
) -> List[CellRow]:
    header_cells = []
    for header in header_rows:
        header_row_cells = []
        for col in cols:
            cell_bbox = calc_bbox_intersection(header.bbox, col.bbox, safety_margin=5)
            if cell_bbox:
                cell_bbox = convert_img_cords_to_pdf_cords(
                    cell_bbox, page_size, image_size
                )
                header_row_cells.append(TableCell(bbox=cell_bbox, variant="header"))
        header_cells.append(CellRow(cells=header_row_cells))
    return header_cells


def is_overlapping_with_headers(
    cell_bbox: BBox, headers: List[CellRow], overlap_threshold: float = 0.9
) -> bool:
    """Reference ml.py:301-318: drop row cells >=90% covered by a header."""
    cell_area = calculate_area(cell_bbox)
    for header in headers:
        for hcell in header.cells:
            intersection = calc_bbox_intersection(cell_bbox, hcell.bbox)
            if intersection:
                if calculate_area(intersection) / cell_area > overlap_threshold:
                    return True
    return False


def process_row_cells(
    rows: List[TableCellModelOutput],
    cols: List[TableCellModelOutput],
    headers: List[CellRow],
    image_size: Size,
    page_size: Size,
) -> List[CellRow]:
    data_cells = []
    for row in rows:
        row_cells = []
        for col in cols:
            cell_bbox = calc_bbox_intersection(row.bbox, col.bbox, safety_margin=5)
            if cell_bbox:
                cell_bbox_pdf = convert_img_cords_to_pdf_cords(
                    cell_bbox, page_size, image_size
                )
                if not is_overlapping_with_headers(cell_bbox_pdf, headers):
                    row_cells.append(TableCell(bbox=cell_bbox_pdf, variant="data"))
        if row_cells:
            data_cells.append(CellRow(cells=row_cells))
    return data_cells


# reference table_transformers/ml.py: MIN_CELL_CONFIDENCE
MIN_CELL_CONFIDENCE = 0.95


def table_from_model_outputs(
    image_size: Size,
    page_size: Size,
    table_bbox: BBox,
    table_cells: List[TableCellModelOutput],
    min_cell_confidence: float = MIN_CELL_CONFIDENCE,
) -> Table:
    """Reference ml.py:208-234."""
    headers = [
        c for c in table_cells if c.is_header and c.confidence > min_cell_confidence
    ]
    rows = [c for c in table_cells if c.is_row and c.confidence > min_cell_confidence]
    cols = [
        c for c in table_cells if c.is_column and c.confidence > min_cell_confidence
    ]
    header_objs = preprocess_header_cells(headers, cols, image_size, page_size)
    row_objs = process_row_cells(rows, cols, header_objs, image_size, page_size)
    return Table(bbox=table_bbox, headers=header_objs, rows=row_objs)


# ---------------------------------------------------------------------------
# B4/B5: detection models behind a protocol; torch-free stub here
# ---------------------------------------------------------------------------


class TableDetector:
    """Protocol matching the reference's model stages (ml.py:184-200,321-356):
    ``find_table_bboxes(image) -> [TableModelOutput]`` and
    ``find_cells(table_image) -> [TableCellModelOutput]``.  Real
    implementations load the microsoft/table-transformer checkpoints once per
    executor process (the Spark pattern mirroring the reference's
    module-import model loading); this sandbox has no torch, so only the
    deterministic stub exists."""

    min_table_confidence: float = 0.75

    def find_table_bboxes(self, image) -> List[TableModelOutput]:
        raise NotImplementedError

    def find_cells(self, table_image) -> List[TableCellModelOutput]:
        raise NotImplementedError


class StubTableDetector(TableDetector):
    """Deterministic fake: emits a grid derived from kwargs, for exercising
    the full assembly path in tests without model weights."""

    def __init__(self, n_rows: int = 2, n_cols: int = 2, cell: float = 100.0):
        self.n_rows = n_rows
        self.n_cols = n_cols
        self.cell = cell

    def find_table_bboxes(self, image=None) -> List[TableModelOutput]:
        w = self.n_cols * self.cell
        h = (self.n_rows + 1) * self.cell
        return [TableModelOutput(label="table", confidence=0.99, bbox=(0, 0, w, h))]

    def find_cells(self, table_image=None) -> List[TableCellModelOutput]:
        out = []
        w = self.n_cols * self.cell
        out.append(
            TableCellModelOutput(
                label="table column header", confidence=0.99, bbox=(0, 0, w, self.cell)
            )
        )
        for r in range(self.n_rows + 1):
            out.append(
                TableCellModelOutput(
                    label="table row",
                    confidence=0.99,
                    bbox=(0, r * self.cell, w, (r + 1) * self.cell),
                )
            )
        for c in range(self.n_cols):
            out.append(
                TableCellModelOutput(
                    label="table column",
                    confidence=0.99,
                    bbox=(
                        c * self.cell,
                        0,
                        (c + 1) * self.cell,
                        (self.n_rows + 1) * self.cell,
                    ),
                )
            )
        return out
