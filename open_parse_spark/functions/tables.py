"""Table renderers — byte-exact reimplementation of the reference's
deterministic table serializers.

Reference: ``/root/reference/src/openparse/tables/pymupdf/parse.py:4-40``;
byte-level goldens at ``src/tests/tables/pymupdf/test_parse.py:4-78``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple


def output_to_html(headers: Sequence[Optional[str]], rows: Sequence[Sequence[Optional[str]]]) -> str:
    """Reference: tables/pymupdf/parse.py:4-21 (falsy cell -> single space)."""
    html_output = '<table border="1">\n'
    html_output += "<tr>"
    for header in headers:
        html_output += f"<th>{header}</th>"
    html_output += "</tr>\n"
    for row in rows:
        html_output += "<tr>"
        for cell in row:
            html_output += f'<td>{cell or " "}</td>'
        html_output += "</tr>\n"
    html_output += "</table>"
    return html_output


def output_to_markdown(
    headers: Optional[Sequence[Optional[str]]],
    rows: Sequence[Sequence[Optional[str]]],
) -> str:
    """Reference: tables/pymupdf/parse.py:24-40 (None header -> "", cell
    None/"" -> " ", newlines in cells -> spaces)."""
    markdown_output = ""
    if headers is not None:
        for header in headers:
            safe_header = "" if header is None else header
            markdown_output += "| " + safe_header + " "
    markdown_output += "|\n"
    markdown_output += "|---" * len(headers) + "|\n"
    for row in rows:
        processed_row = [
            " " if cell in [None, ""] else cell.replace("\n", " ") for cell in row
        ]
        markdown_output += "| " + " | ".join(processed_row) + " |\n"
    return markdown_output


def combine_header_and_table_bboxes(
    bbox1: Tuple[float, float, float, float],
    bbox2: Tuple[float, float, float, float],
) -> Tuple[float, float, float, float]:
    """Reference: tables/pymupdf/parse.py:43-51."""
    return (
        min(bbox1[0], bbox2[0]),
        min(bbox1[1], bbox2[1]),
        max(bbox1[2], bbox2[2]),
        max(bbox1[3], bbox2[3]),
    )


def clean_headers(headers: List[Optional[str]]) -> List[str]:
    """Header whitespace strip / None -> "" as done at table ingest.

    Reference: tables/parse.py:53-58.
    """
    out = []
    for header in headers:
        out.append("" if header is None else header.strip())
    return out
