"""Turn payload decoding — the PDF stand-in.

A turn's ``text``/``tool`` columns carry either (a) a JSON document payload
per the grammar in ``/root/repo/FIXTURES.md`` §2 — the deterministic
serialized form of what pdfminer/pymupdf would hand the reference — or (b)
plain prose, which is laid out deterministically onto synthetic pages.

Decoding mirrors the reference's extraction stages:
- text elements: line/span assembly as in ``text/pdfminer/core.py:209-242``
  (element text = "\\n".join(line.text), bbox = min/max fold of line bboxes);
  optional char-level input runs the T2-T4 char->span grouping.
- table elements: header cleanup + markdown/HTML rendering as in
  ``tables/parse.py:43-89`` + ``tables/pymupdf/parse.py:4-40``.
- image elements: opaque base64 + mimetype as in ``text/pdfminer/core.py:243-271``.
"""

from __future__ import annotations

import json

try:  # orjson: ~5x faster loads; byte-identical parse trees for our
    # payload grammar (objects/arrays/strings/numbers/bools) — json is the
    # fallback so the env dependency stays soft
    import orjson

    def _json_loads(s):
        try:
            return orjson.loads(s)
        except orjson.JSONDecodeError:
            # orjson rejects NaN/Infinity literals that json.loads accepts;
            # retry with json so parse output never depends on whether
            # orjson happens to be installed.
            return json.loads(s)

except ImportError:  # pragma: no cover
    _json_loads = json.loads
from typing import Any, Dict, List, Optional

from open_parse_spark.core.model import (
    MIN_HEADING_SIZE,
    Bbox,
    ImageElement,
    LineElement,
    Node,
    TableElement,
    TextElement,
    TextSpan,
    clean_markdown_formatting,
)
from open_parse_spark.core.spans import create_line_element, get_lines_bbox
from open_parse_spark.functions.tables import (
    clean_headers,
    output_to_html,
    output_to_markdown,
)

Element = Any

DEFAULT_PAGE_WIDTH = 612.0
DEFAULT_PAGE_HEIGHT = 792.0
_PROSE_MARGIN_X = 72.0
_PROSE_TOP_Y = 720.0
_PROSE_LINE_HEIGHT = 14.0
_PROSE_PARA_GAP = 14.0
_PROSE_CHAR_WIDTH = 6.0
_PROSE_MIN_Y = 72.0


def _decode_line(line_obj: Dict[str, Any]) -> LineElement:
    bbox = tuple(line_obj["bbox"])
    if "chars" in line_obj:
        raw_chars = [
            (c.get("text", ""), c.get("fontname", ""), float(c.get("size", 0.0)))
            for c in line_obj["chars"]
        ]
        return create_line_element(raw_chars, bbox)
    spans = tuple(
        TextSpan(
            text=s.get("text", ""),
            is_bold=bool(s.get("is_bold", False)),
            is_italic=bool(s.get("is_italic", False)),
            size=float(s.get("size", 0.0)),
        )
        for s in line_obj.get("spans", [])
    )
    return LineElement(bbox=bbox, spans=spans)


class LazyLinesTextElement(TextElement):
    """Layout-path TextElement whose LineElements are materialized lazily.

    The hot path needs only the element-level aggregates — joined text,
    bbox fold, and the ``all(line.is_heading)`` / ``all(line.is_bold)``
    style folds — all of which ``_flat_decode_text_lines`` computes straight
    off the span dicts without constructing ~6 TextSpan+LineElement objects
    per line for nobody (the only ``.lines`` consumers in the repo are those
    two folds, plus tests).  A cold reader rebuilds lines from
    ``line_specs`` — compact ``(bbox4, ((text, bold, italic, size), ...))``
    tuples, NOT the decoded JSON dicts, so the payload's parse tree stays
    GC-able after decode (heavy-tailed megabyte payloads would otherwise be
    pinned in dict form for the element's lifetime; review finding).
    Rebuild equality is asserted in tests/test_payload_flat.py."""

    __slots__ = ("_line_specs", "_lines_cache", "_flat_heading", "_flat_bold")

    def __init__(self, text, bbox, line_specs, is_heading, is_bold):
        self.text = text
        self.bbox = bbox
        self._tokens = None
        self._line_specs = line_specs
        self._lines_cache = None
        self._flat_heading = is_heading
        self._flat_bold = is_bold

    @property
    def lines(self):
        if self._lines_cache is None:
            self._lines_cache = tuple(
                LineElement(
                    bbox=bbox, spans=tuple(TextSpan(*s) for s in spans)
                )
                for bbox, spans in self._line_specs
            )
        return self._lines_cache

    @property
    def is_heading(self) -> bool:
        return self._flat_heading

    @property
    def is_bold(self) -> bool:
        return self._flat_bold


def _flat_decode_text_lines(raw_lines: list):
    """Element-level aggregates for a span-shaped text element, computed
    without LineElement/TextSpan construction.

    Returns ``(text, bbox_fold, all_heading, all_bold, line_specs)`` —
    value-identical to building the objects and folding
    (differential-tested), or ``None`` when any line uses the char-level
    grammar (T2-T4 grouping stays on the object path).  ``line_specs``
    carries compact ``(raw_bbox4, normalized_span_tuples)`` for the lazy
    cold-path rebuild, detached from the decoded JSON dicts.
    """
    texts = []
    fx0 = fy0 = fx1 = fy1 = None
    all_heading = all_bold = True
    line_specs = []
    for line_obj in raw_lines:
        if "chars" in line_obj:
            return None
        # bbox rounded to 2dp exactly as LineElement.__init__ does; the
        # element fold runs over the ROUNDED values
        b0, b1, b2, b3 = line_obj["bbox"]
        rb0, rb1, rb2, rb3 = round(b0, 2), round(b1, 2), round(b2, 2), round(b3, 2)
        if fx0 is None:
            fx0, fy0, fx1, fy1 = rb0, rb1, rb2, rb3
        else:
            if rb0 < fx0:
                fx0 = rb0
            if rb1 < fy0:
                fy0 = rb1
            if rb2 > fx1:
                fx1 = rb2
            if rb3 > fy1:
                fy1 = rb3
        spans = line_obj.get("spans", [])
        flags = [
            (
                s.get("text", ""),
                bool(s.get("is_bold", False)),
                bool(s.get("is_italic", False)),
                float(s.get("size", 0.0)),
            )
            for s in spans
        ]
        line_specs.append(((b0, b1, b2, b3), tuple(flags)))
        n = len(flags)
        # fast paths for the two overwhelming cases (value-identical to the
        # general transition-marker loop below): a single span, and a line
        # with no styled span at all
        if n == 1:
            t, bold, italic, _sz = flags[0]
            if bold:  # prefix order bold-then-italic, suffix the same
                t = "***" + t + "***" if italic else "**" + t + "**"
            elif italic:
                t = "*" + t + "*"
            texts.append(clean_markdown_formatting(t))
        elif not any(f[1] or f[2] for f in flags):
            texts.append(
                clean_markdown_formatting("".join(f[0] for f in flags))
            )
        else:
            parts = []
            for i, (t, bold, italic, _sz) in enumerate(flags):
                # TextSpan.formatted_text transition markers, same order:
                # bold prefix, italic prefix (outermost left), bold suffix,
                # italic suffix (outermost right)
                if bold and (i == 0 or not flags[i - 1][1]):
                    t = "**" + t
                if italic and (i == 0 or not flags[i - 1][2]):
                    t = "*" + t
                if bold and (i == n - 1 or not flags[i + 1][1]):
                    t = t + "**"
                if italic and (i == n - 1 or not flags[i + 1][2]):
                    t = t + "*"
                parts.append(t)
            texts.append(clean_markdown_formatting("".join(parts)))
        if all_heading or all_bold:
            # LineElement style folds ignore the trailing span when >1 span
            style = flags[:-1] if n > 1 else flags
            for _t, bold, _it, size in style:
                if not bold:
                    all_bold = all_heading = False
                    break
                if all_heading and size < MIN_HEADING_SIZE:
                    all_heading = False
    return (
        "\n".join(texts),
        (fx0, fy0, fx1, fy1),
        all_heading,
        all_bold,
        line_specs,
    )


def _decode_page_elements(page_obj: Dict[str, Any]) -> List[Element]:
    page = int(page_obj.get("page", 0))
    width = float(page_obj.get("width", DEFAULT_PAGE_WIDTH))
    height = float(page_obj.get("height", DEFAULT_PAGE_HEIGHT))
    out: List[Element] = []
    for el in page_obj.get("elements", []):
        kind = el.get("kind", "text")
        if kind == "text":
            raw_lines = el.get("lines", [])
            if not raw_lines:
                continue
            flat = _flat_decode_text_lines(raw_lines)
            if flat is not None:
                text, fold, all_heading, all_bold, line_specs = flat
                if "bbox" in el:
                    x0, y0, x1, y1 = el["bbox"]
                else:
                    x0, y0, x1, y1 = fold
                out.append(
                    LazyLinesTextElement(
                        text=text,
                        bbox=Bbox(
                            page=page,
                            page_width=width,
                            page_height=height,
                            x0=float(x0),
                            y0=float(y0),
                            x1=float(x1),
                            y1=float(y1),
                        ),
                        line_specs=line_specs,
                        is_heading=all_heading,
                        is_bold=all_bold,
                    )
                )
                continue
            lines = [_decode_line(line) for line in raw_lines]
            if "bbox" in el:
                x0, y0, x1, y1 = el["bbox"]
            else:
                x0, y0, x1, y1 = get_lines_bbox(lines)
            out.append(
                TextElement(
                    text="\n".join([line.text for line in lines]),
                    lines=tuple(lines),
                    bbox=Bbox(
                        page=page,
                        page_width=width,
                        page_height=height,
                        x0=float(x0),
                        y0=float(y0),
                        x1=float(x1),
                        y1=float(y1),
                    ),
                )
            )
        elif kind == "ocr_text":
            # OCR-engine path (T6): raw OCR lines with pymupdf-style font
            # flags, merged by overlap at similar height
            # (reference text/pymupdf/core.py:35-102)
            from open_parse_spark.core.spans import lines_from_ocr_output

            lines = lines_from_ocr_output(
                el.get("lines", []), error_margin=float(el.get("error_margin", 0))
            )
            if not lines:
                continue
            if "bbox" in el:
                x0, y0, x1, y1 = el["bbox"]
            else:
                x0, y0, x1, y1 = get_lines_bbox(lines)
            out.append(
                TextElement(
                    text="\n".join([line.text for line in lines]),
                    lines=tuple(lines),
                    bbox=Bbox(
                        page=page,
                        page_width=width,
                        page_height=height,
                        x0=float(x0),
                        y0=float(y0),
                        x1=float(x1),
                        y1=float(y1),
                    ),
                )
            )
        elif kind == "table":
            headers = clean_headers(list(el.get("headers", [])))
            rows = el.get("rows", [])
            fmt = el.get("output_format", "html")
            if fmt in ("str", "markdown"):
                text = output_to_markdown(headers, rows)
            else:
                text = output_to_html(headers, rows)
            x0, y0, x1, y1 = el["bbox"]
            out.append(
                TableElement(
                    text=text,
                    bbox=Bbox(
                        page=page,
                        page_width=width,
                        page_height=height,
                        x0=float(x0),
                        y0=float(y0),
                        x1=float(x1),
                        y1=float(y1),
                    ),
                )
            )
        elif kind == "image":
            x0, y0, x1, y1 = el["bbox"]
            out.append(
                ImageElement(
                    text=el.get("text", ""),
                    image=el.get("image", ""),
                    image_mimetype=el.get("image_mimetype", "unknown"),
                    bbox=Bbox(
                        page=page,
                        page_width=width,
                        page_height=height,
                        x0=float(x0),
                        y0=float(y0),
                        x1=float(x1),
                        y1=float(y1),
                    ),
                )
            )
    return out


def _fast_prose_line(bbox, line_text: str) -> LineElement:
    """Construct a single-regular-span line without redundant work.

    Semantically identical to ``LineElement(bbox, (TextSpan(line_text, F, F,
    11.0),))``: prose coordinates are exact multiples of 0.5 (rounding to 2dp
    is the identity), an unstyled span's formatted_text is its text, and the
    markdown cleanup is applied iff the text contains ``*``/``_`` (the same
    fast path ``clean_markdown_formatting`` takes).  Guarded by the frozen
    golden (tests/test_golden_freeze.py) and the prose property tests."""
    from open_parse_spark.core.model import clean_markdown_formatting

    line = LineElement.__new__(LineElement)
    line.bbox = bbox
    line.spans = (
        TextSpan(text=line_text, is_bold=False, is_italic=False, size=11.0),
    )
    line._text = clean_markdown_formatting(line_text)
    return line


class ProseTextElement(TextElement):
    """TextElement whose LineElements are materialized lazily.

    The prose layout is fully determined by (raw_lines, y1), and the hot
    path never reads ``.lines`` on prose (``is_heading``/``is_bold`` are
    identically False: every prose line is one regular 11 pt span, and a
    paragraph always has >= 1 line, so the reference's ``all(...)`` folds are
    False) — constructing ~7 LineElement+TextSpan objects per turn for
    nobody was ~6% of parse CPU.  Any cold-path reader gets lines built by
    the exact eager construction (``_fast_prose_line``)."""

    __slots__ = ("_prose_spec", "_lines_cache")

    def __init__(self, text: str, bbox: Bbox, prose_spec: tuple):
        self.text = text
        self.bbox = bbox
        self._tokens = None
        self._prose_spec = prose_spec
        self._lines_cache = None

    @property
    def lines(self):
        if self._lines_cache is None:
            raw_lines, y1 = self._prose_spec
            self._lines_cache = tuple(
                _fast_prose_line(
                    (
                        _PROSE_MARGIN_X,
                        (y1 - i * _PROSE_LINE_HEIGHT) - (_PROSE_LINE_HEIGHT - 2.0),
                        _PROSE_MARGIN_X
                        + max(1.0, _PROSE_CHAR_WIDTH * len(line_text)),
                        y1 - i * _PROSE_LINE_HEIGHT,
                    ),
                    line_text,
                )
                for i, line_text in enumerate(raw_lines)
            )
        return self._lines_cache

    @property
    def is_heading(self) -> bool:
        return False

    @property
    def is_bold(self) -> bool:
        return False


def _prose_to_elements(text: str) -> List[Element]:
    """Deterministic layout of plain prose onto synthetic pages.

    One TextElement per paragraph ("\\n\\n"-separated); lines wrap at 78
    chars; y descends from the top margin, new page when the column is full.
    Purely deterministic so the same prose always yields the same layout.
    """
    from open_parse_spark.core.model import clean_markdown_formatting

    elements: List[Element] = []
    page = 0
    y1 = _PROSE_TOP_Y
    for para in text.split("\n\n"):
        para = para.strip()
        if not para:
            continue
        raw_lines: List[str] = []
        for src_line in para.split("\n"):
            if len(src_line) <= 78:
                raw_lines.append(src_line)
            else:
                # index-based chunking: re-slicing the shrinking remainder
                # is O(n^2) bytes copied and took minutes on 10 MB turns
                raw_lines.extend(
                    src_line[s : s + 78] for s in range(0, len(src_line), 78)
                )
        needed = len(raw_lines) * _PROSE_LINE_HEIGHT
        if y1 - needed < _PROSE_MIN_Y:
            page += 1
            y1 = _PROSE_TOP_Y
        # bbox fold computed arithmetically with the SAME per-line
        # expressions the lazy line builder uses (get_lines_bbox equality):
        # x0 = margin; y1 = first line's top; y0 = last line's bottom;
        # x1 = max per-line right edge
        n = len(raw_lines)
        ly1_last = y1 - (n - 1) * _PROSE_LINE_HEIGHT
        y0 = ly1_last - (_PROSE_LINE_HEIGHT - 2.0)
        x1 = max(
            _PROSE_MARGIN_X + max(1.0, _PROSE_CHAR_WIDTH * len(t))
            for t in raw_lines
        )
        elements.append(
            ProseTextElement(
                text="\n".join(
                    clean_markdown_formatting(t) for t in raw_lines
                ),
                bbox=Bbox(
                    page=page,
                    page_width=DEFAULT_PAGE_WIDTH,
                    page_height=DEFAULT_PAGE_HEIGHT,
                    x0=_PROSE_MARGIN_X,
                    y0=y0,
                    x1=x1,
                    y1=y1,
                ),
                prose_spec=(tuple(raw_lines), y1),
            )
        )
        y1 = y0 - _PROSE_PARA_GAP
    return elements


def decode_payload(text: Optional[str], tool: Optional[str]) -> List[Element]:
    """Decode a turn's (text, tool) into extraction elements.

    ``text`` carries the document payload; ``tool`` may carry a second JSON
    payload (table grids for table-turn fixtures, FIXTURES.md §1).
    """
    elements: List[Element] = []
    for payload in (text, tool):
        if not payload:
            continue
        stripped = payload.lstrip()
        if stripped.startswith("{"):
            try:
                obj = _json_loads(payload)
            except (ValueError, TypeError):
                obj = None
            if isinstance(obj, dict) and "pages" in obj:
                for page_obj in obj["pages"]:
                    elements.extend(_decode_page_elements(page_obj))
                continue
        elif stripped[:1] == "<":
            # HTML turn: DOM boilerplate strip + main-content extraction,
            # laid out onto the same synthetic pages (core/html.py)
            from open_parse_spark.core.html import (
                html_to_elements,
                looks_like_html,
            )

            if looks_like_html(stripped):
                elements.extend(html_to_elements(payload))
                continue
        # plain prose fallback (only sensible for the text column)
        if payload is text:
            elements.extend(_prose_to_elements(payload))
    return elements


def elements_to_nodes(elements: List[Element]) -> List[Node]:
    """One single-element Node per element; reference doc_parser.py:128-137."""
    return [Node(elements=(e,)) for e in elements]
