"""Char -> span -> line structuring (text extraction T2-T4).

Reference: ``/root/reference/src/openparse/text/pdfminer/core.py``.
Golden-tested against the reference's own expected span lists
(``src/tests/text/pdf_miner/test_core.py:39-117``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, List, Sequence, Tuple

from open_parse_spark.core.model import LineElement, TextSpan


@dataclass(frozen=True)
class CharElement:
    """Reference: text/pdfminer/core.py:23-40 (size rounded to 2dp)."""

    text: str
    fontname: str
    size: float

    def __post_init__(self):
        object.__setattr__(self, "size", round(self.size, 2))

    @property
    def is_bold(self) -> bool:
        return "Bold" in self.fontname or "bold" in self.fontname

    @property
    def is_italic(self) -> bool:
        return "Italic" in self.fontname or "italic" in self.fontname


def extract_chars(
    raw_chars: Sequence[Tuple[str, str, float]], anno_marker: str = ""
) -> List[CharElement]:
    """LTAnno-style font inheritance: whitespace/annotation chars (empty
    fontname) inherit the most recent real char's font and size; annotations
    *before* the first real char take the first real char's font.

    Reference: text/pdfminer/core.py:43-67.
    ``raw_chars``: (text, fontname, size) triples; fontname == "" marks an
    LTAnno (no own font).
    """
    chars: List[CharElement] = []
    last_fontname = next((f for _, f, _ in raw_chars if f != ""), "")
    last_size = next((s for _, f, s in raw_chars if f != ""), 0.0)
    for text, fontname, size in raw_chars:
        if fontname != "":
            last_fontname = fontname
            last_size = size
        chars.append(CharElement(text=text, fontname=last_fontname, size=last_size))
    return chars


def group_chars_into_spans(chars: Iterable[CharElement]) -> List[TextSpan]:
    """Run-length group chars by (bold, italic, size) with whitespace
    compression and the trailing-space rule.

    Reference: text/pdfminer/core.py:99-140.
    """
    spans: List[TextSpan] = []
    current_text = ""
    current_style = (False, False, 0.0)

    for char in chars:
        char_style = (char.is_bold, char.is_italic, char.size)
        if char.text.isspace():
            if not current_text.endswith(" "):
                current_text += " "
            continue
        if char_style != current_style and current_text:
            spans.append(
                TextSpan(
                    text=current_text.rstrip()
                    + (" " if current_text.endswith(" ") else ""),
                    is_bold=current_style[0],
                    is_italic=current_style[1],
                    size=current_style[2],
                )
            )
            current_text = char.text
        else:
            current_text += char.text
        current_style = char_style

    if current_text:
        spans.append(
            TextSpan(
                text=current_text.rstrip()
                + (" " if current_text.endswith(" ") else ""),
                is_bold=current_style[0],
                is_italic=current_style[1],
                size=current_style[2],
            )
        )
    return spans


def create_line_element(
    raw_chars: Sequence[Tuple[str, str, float]],
    bbox: Tuple[float, float, float, float],
) -> LineElement:
    """Reference: text/pdfminer/core.py:143-148."""
    chars = extract_chars(raw_chars)
    spans = group_chars_into_spans(chars)
    return LineElement(bbox=bbox, spans=tuple(spans))


def is_bold_flags(flags: int) -> bool:
    """PyMuPDF font-flag decode; reference text/pymupdf/core.py:27-28."""
    return bool(flags & 2**4)


def is_italic_flags(flags: int) -> bool:
    """Reference text/pymupdf/core.py:31-32."""
    return bool(flags & 2**1)


def lines_from_ocr_output(lines: Sequence[dict], error_margin: float = 0) -> List[LineElement]:
    """OCR line assembly with overlap merge (T6).

    Greedy: each incoming line merges into the FIRST already-combined line it
    overlaps at similar height; reference text/pymupdf/core.py:35-66.
    """
    combined: List[LineElement] = []
    for line in lines:
        bbox = tuple(line["bbox"])
        spans = tuple(
            TextSpan(
                text=span["text"],
                is_bold=is_bold_flags(span.get("flags", 0))
                if "flags" in span
                else bool(span.get("is_bold", False)),
                is_italic=is_italic_flags(span.get("flags", 0))
                if "flags" in span
                else bool(span.get("is_italic", False)),
                size=float(span.get("size", 0.0)),
            )
            for span in line["spans"]
        )
        line_element = LineElement(bbox=bbox, spans=spans)
        for i, other in enumerate(combined):
            if line_element.overlaps(
                other, error_margin=error_margin
            ) and line_element.is_at_similar_height(other, error_margin=error_margin):
                combined[i] = line_element.combine(other)
                break
        else:
            combined.append(line_element)
    return combined


def get_lines_bbox(lines: List[LineElement]) -> Tuple[float, float, float, float]:
    """Min/max fold over line bboxes; reference text/pdfminer/core.py:151-157."""
    return (
        min(line.bbox[0] for line in lines),
        min(line.bbox[1] for line in lines),
        max(line.bbox[2] for line in lines),
        max(line.bbox[3] for line in lines),
    )
