"""HTML main-content extraction — boilerplate strip + DOM heuristics.

The reference (Filimoa/open-parse) ingests PDFs only; the north-star
pipeline also ingests HTML turns ("HTML boilerplate strip, DOM heuristics").
This module is that DOM side, built dependency-free on stdlib
``html.parser``:

- **Boilerplate containers dropped by tag**: ``script``/``style``/``head``/
  ``nav``/``header``/``footer``/``aside``/``form``/... — the subtree never
  reaches a block.
- **Boilerplate by class/id token**: ``sidebar``, ``menu``, ``ad``,
  ``social``, ``breadcrumb``, ... (the classic readability/trafilatura
  signal set) prune the subtree.
- **Link-density pruning** (Kohlschuetter-style): a short flowing block
  whose text is mostly anchor text is navigation, not content.
- **Structure kept**: h1-h6 become heading blocks (mapped to bold spans
  sized >= the reference's heading threshold so heading-merge transforms
  fire), p/div runs become paragraphs, ul/ol become bullet lists, table
  rows are captured and rendered byte-compatibly with
  ``functions/tables.py`` renderers.

``extract_main_blocks`` is the pure extraction surface (oracle-checked in
the registry: content injected into a deterministic chrome template must
round-trip exactly while every piece of chrome is dropped).
``html_to_elements`` lays blocks onto the same deterministic synthetic
pages the prose path uses, so every downstream node transform (reading
order, spatial merge, stubs, bullets, heading merge) runs unchanged.

Scale: pure per-turn Python executed inside the existing Arrow
``mapInPandas`` parse stage — zero shuffle, no per-row Python UDF, no new
cluster machinery.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Any, Dict, List

# containers whose entire subtree is boilerplate (never content)
_DROP_TAGS = frozenset(
    "script style noscript template iframe svg head title form button "
    "select option textarea nav header footer aside".split()
)
# tags that terminate/flush a flowing text block
_BLOCK_TAGS = frozenset(
    "p div section article main blockquote pre address figure figcaption "
    "html body hr".split()
)
# void elements: no matching end tag (drop-depth tracking must skip them)
_VOID_TAGS = frozenset(
    "br img hr meta link input area base col embed source track wbr".split()
)
# class/id tokens that mark a subtree as boilerplate
_BOILER_TOKENS = frozenset(
    "nav navbar menu sidebar footer header comment comments ad ads advert "
    "advertisement banner social share sharing breadcrumb breadcrumbs "
    "cookie popup modal related widget promo subscribe newsletter".split()
)
_HEADING_SIZES = {
    "h1": 24.0,
    "h2": 20.0,
    "h3": 18.0,
    "h4": 16.0,  # >= MIN_HEADING_SIZE(16): h1-h4 are pipeline headings
    "h5": 14.0,  # bold but below threshold — styled, not a heading
    "h6": 12.0,
}
# explicit ASCII whitespace class — the RE2/Java/DuckDB-common subset pinned
# in tests/test_dialect_parity.py (\v is NOT included: Java \s excludes it,
# and the DuckDB oracle mirrors this exact class)
_WS_RE = re.compile(r"[ \t\n\r\f]+")
_TOKEN_SPLIT_RE = re.compile(r"[^a-z0-9]+")

# a short flowing block that is mostly anchor text is navigation
_LINK_DENSITY_MAX = 0.66
_LINK_DENSITY_MIN_WORDS = 40


def _norm(s: str) -> str:
    return _WS_RE.sub(" ", s).strip(" ")


def _normalize_runs(raw_runs: List[tuple]) -> List[tuple]:
    """Collapse whitespace ACROSS style runs so the concatenation of the
    returned texts equals ``_norm`` of the raw concatenation.  Separator
    spaces attach to the PRECEDING run (a bold span never starts with the
    inter-word space, keeping the markdown markers tight)."""
    out: List[List[Any]] = []  # [text, bold, italic]
    pending = False
    for raw, bold, italic in raw_runs:
        parts = _WS_RE.split(raw)
        buf: List[str] = []
        for j, w in enumerate(parts):
            if j > 0:
                pending = True
            if w:
                if pending and (buf or out):
                    if buf:
                        buf.append(" ")
                    elif (out[-1][1] + out[-1][2]) <= (bold + italic):
                        # boundary space joins the less-styled side so the
                        # markdown markers stay tight around styled words
                        out[-1][0] += " "
                    else:
                        buf.append(" ")
                pending = False
                buf.append(w)
        if buf:
            if out and out[-1][1] == bold and out[-1][2] == italic:
                out[-1][0] += "".join(buf)
            else:
                out.append(["".join(buf), bold, italic])
    return [(t, b, i) for t, b, i in out]


class _MainContentParser(HTMLParser):
    """Single-pass block builder.  Malformed HTML never raises: unclosed
    tags at EOF flush, stray end tags are ignored, void tags don't count
    toward drop-subtree depth."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[Dict[str, Any]] = []
        self._drop_depth = 0
        self._drop_tag = ""
        self._a_depth = 0
        self._bold_depth = 0
        self._italic_depth = 0
        # stack of tag names that opened a main-content scope
        # (<main>/<article>/role="main"); non-empty => inside main content
        self._main_openers: List[str] = []
        self._pre_depth = 0  # inside <pre>: whitespace is content
        self._heading: str | None = None
        # flowing text accumulates as (chunk, bold, italic) style runs
        self._buf: List[tuple] = []
        self._link_buf: List[str] = []
        # lists
        self._list_depth = 0
        self._items: List[str] = []
        # tables (structure parsed at depth 1 only; nested tables flatten
        # into the enclosing cell's text)
        self._table_depth = 0
        self._rows: List[List[str]] = []
        self._row_is_header: List[bool] = []
        self._cells: List[str] = []
        self._cell_buf: List[str] = []
        self._cur_row_header = False
        self._in_cell = False

    # -- block assembly ----------------------------------------------------

    def _flush_text(self, kind: str = "text", level: int = 0) -> None:
        runs = _normalize_runs(self._buf)
        link_text = _norm("".join(self._link_buf))
        self._buf, self._link_buf = [], []
        if not runs:
            return
        block = {
            "kind": kind,
            "text": "".join(r[0] for r in runs),
            "level": level,
            "link_chars": len(link_text),
            "in_main": bool(self._main_openers),
        }
        # inline style runs matter for flowing text (they become TextSpans);
        # headings are whole-line bold by construction
        if kind == "text" and any(b or i for _, b, i in runs):
            block["runs"] = runs
        self.blocks.append(block)

    def _flush_pre(self) -> None:
        # <pre> whitespace is content: no collapsing, no style runs; only
        # the newlines that hug the tags are trimmed
        text = "".join(t for t, _, _ in self._buf).strip("\n")
        self._buf, self._link_buf = [], []
        if not text.strip(" \t"):
            return
        self.blocks.append(
            {
                "kind": "text",
                "text": text,
                "level": 0,
                "link_chars": 0,
                "in_main": bool(self._main_openers),
                "preformatted": True,
            }
        )

    def _flush_item(self) -> None:
        text = _norm("".join(t for t, _, _ in self._buf))
        link_text = _norm("".join(self._link_buf))
        self._buf, self._link_buf = [], []
        if text:
            self._items.append((text, len(link_text)))

    def _flush_list(self) -> None:
        self._flush_item()
        items, self._items = self._items, []
        if not items:
            return
        self.blocks.append(
            {
                "kind": "list",
                "text": "\n".join("- " + t for t, _ in items),
                "level": 0,
                "link_chars": sum(lc for _, lc in items),
                # density denominator: raw item text, not the "- " bullets
                "content_chars": sum(len(t) for t, _ in items),
                "in_main": bool(self._main_openers),
            }
        )

    def _flush_table(self) -> None:
        rows, self._rows = self._rows, []
        headers_flags, self._row_is_header = self._row_is_header, []
        if not rows:
            return
        headers: List[str] = []
        if headers_flags and headers_flags[0]:
            headers = rows[0]
            rows = rows[1:]
        self.blocks.append(
            {
                "kind": "table",
                "text": "",
                "level": 0,
                "link_chars": 0,
                "headers": headers,
                "rows": rows,
                "in_main": bool(self._main_openers),
            }
        )

    # -- tag handling ------------------------------------------------------

    def _is_boiler_attrs(self, attrs) -> bool:
        marker = " ".join(
            v for k, v in attrs if k in ("class", "id") and v
        ).lower()
        if not marker:
            return False
        return not _BOILER_TOKENS.isdisjoint(_TOKEN_SPLIT_RE.split(marker))

    def handle_starttag(self, tag, attrs):
        if self._drop_depth:
            # count only the DROP OPENER's tag: HTML5 auto-closing tags
            # (unclosed <p>/<li>/<dt> inside a nav/footer) would desync a
            # count-every-tag depth and silently swallow the rest of the
            # document (caught by review; nesting of the same container
            # tag is what actually needs balancing)
            if tag == self._drop_tag:
                self._drop_depth += 1
            return
        if tag in _DROP_TAGS or self._is_boiler_attrs(attrs):
            if tag not in _VOID_TAGS:
                self._drop_depth = 1
                self._drop_tag = tag
            return
        # main-scope bookkeeping runs for every non-dropped tag so nested
        # occurrences of the opener tag stay balanced (e.g. <div role=main>
        # containing plain <div>s — caught by review)
        if tag in ("main", "article") or any(
            k == "role" and v and v.lower() == "main" for k, v in attrs
        ):
            self._main_openers.append([tag, 1])
        elif self._main_openers and tag == self._main_openers[-1][0]:
            self._main_openers[-1][1] += 1
        if self._pre_depth:
            if tag == "pre":
                self._pre_depth += 1
            elif tag == "br":
                self._append_data("\n")
            return  # structure inside <pre> is content, not layout
        if self._table_depth:
            if tag == "table":
                self._table_depth += 1
            elif self._table_depth == 1:
                if tag == "tr":
                    self._cur_row_header = False
                    self._cells = []
                elif tag in ("td", "th"):
                    self._in_cell = True
                    self._cell_buf = []
                    if tag == "th":
                        self._cur_row_header = True
            return
        if tag == "table":
            self._flush_text()
            self._table_depth = 1
            self._rows, self._row_is_header = [], []
            return
        if tag in ("ul", "ol"):
            if self._list_depth == 0:
                self._flush_text()
            self._list_depth += 1
            return
        if tag == "li":
            if self._list_depth:
                self._flush_item()
            return
        if tag in _HEADING_SIZES:
            self._flush_text()
            self._heading = tag
            return
        if tag == "a":
            self._a_depth += 1
            return
        if tag in ("b", "strong"):
            self._bold_depth += 1
            return
        if tag in ("i", "em"):
            self._italic_depth += 1
            return
        if tag == "br":
            self._append_data(" ")
            return
        if tag == "pre":
            if self._list_depth:
                self._append_data(" ")
                return
            self._flush_text()
            self._pre_depth = 1
            return
        if tag in _BLOCK_TAGS:
            if self._list_depth:  # block tag inside an <li>: soft separator
                self._append_data(" ")
            else:
                self._flush_text()

    def handle_startendtag(self, tag, attrs):
        if tag == "br" and not self._drop_depth:
            # XHTML self-closed <br/> must behave like <br> (newline in
            # <pre>, soft space elsewhere — caught by review)
            self._append_data("\n" if self._pre_depth else " ")

    def _main_close(self, tag) -> None:
        if self._main_openers and tag == self._main_openers[-1][0]:
            self._main_openers[-1][1] -= 1
            if self._main_openers[-1][1] == 0:
                # flush buffered content while still inside the scope so it
                # keeps in_main=True
                if self._pre_depth:
                    self._pre_depth = 0
                    self._flush_pre()
                else:
                    # malformed HTML can close <main> with a table or list
                    # still open; flush them here too, else their buffered
                    # content flushes later with in_main=False and is
                    # dropped by the main-scope filter
                    if self._table_depth:
                        self._table_depth = 0
                        if self._in_cell:
                            self._cells.append(
                                _norm("".join(self._cell_buf))
                            )
                            self._in_cell = False
                            self._cell_buf = []
                        if self._cells:
                            self._rows.append(self._cells)
                            self._row_is_header.append(
                                self._cur_row_header
                            )
                            self._cells = []
                        self._flush_table()
                    if self._list_depth:
                        self._list_depth = 0
                        self._flush_list()
                    self._flush_text()
                self._main_openers.pop()

    def handle_endtag(self, tag):
        if self._drop_depth:
            if tag == self._drop_tag:
                self._drop_depth -= 1
            return
        self._main_close(tag)
        if self._pre_depth:
            # end tags inside <pre> are content, not structure: without
            # this guard </b>/</a> opened OUTSIDE the pre would be
            # decremented by markup INSIDE it (caught by review)
            if tag == "pre":
                self._pre_depth -= 1
                if self._pre_depth == 0:
                    self._flush_pre()
            return
        if self._table_depth:
            if tag == "table":
                self._table_depth -= 1
                if self._table_depth == 0:
                    self._flush_table()
            elif self._table_depth == 1:
                if tag in ("td", "th"):
                    if self._in_cell:
                        self._cells.append(_norm("".join(self._cell_buf)))
                        self._in_cell = False
                        self._cell_buf = []
                elif tag == "tr":
                    if self._in_cell:  # unclosed cell
                        self._cells.append(_norm("".join(self._cell_buf)))
                        self._in_cell = False
                        self._cell_buf = []
                    if self._cells:
                        self._rows.append(self._cells)
                        self._row_is_header.append(self._cur_row_header)
                    self._cells = []
            return
        if tag in ("ul", "ol"):
            if self._list_depth:
                self._list_depth -= 1
                if self._list_depth == 0:
                    self._flush_list()
            return
        if tag == "li":
            if self._list_depth:
                self._flush_item()
            return
        if tag in _HEADING_SIZES:
            if self._heading:
                self._flush_text(kind="heading", level=int(tag[1]))
                self._heading = None
            return
        if tag == "a":
            if self._a_depth:
                self._a_depth -= 1
            return
        if tag in ("b", "strong"):
            if self._bold_depth:
                self._bold_depth -= 1
            return
        if tag in ("i", "em"):
            if self._italic_depth:
                self._italic_depth -= 1
            return
        if tag in _BLOCK_TAGS:
            if self._list_depth:
                self._append_data(" ")
            else:
                self._flush_text()

    def _append_data(self, data: str) -> None:
        self._buf.append(
            (data, self._bold_depth > 0, self._italic_depth > 0)
        )

    def handle_data(self, data):
        if self._drop_depth or not data:
            return
        if self._table_depth:
            if self._in_cell:
                self._cell_buf.append(data)
            return
        self._append_data(data)
        if self._a_depth:
            self._link_buf.append(data)

    def close(self):
        super().close()
        # EOF with unclosed structures: flush everything in document order
        if self._table_depth:
            if self._in_cell:
                self._cells.append(_norm("".join(self._cell_buf)))
                self._in_cell = False
            if self._cells:
                self._rows.append(self._cells)
                self._row_is_header.append(self._cur_row_header)
            self._table_depth = 0
            self._flush_table()
        if self._list_depth:
            self._list_depth = 0
            self._flush_list()
        if self._pre_depth:
            self._pre_depth = 0
            self._flush_pre()
        if self._heading:
            self._flush_text(kind="heading", level=int(self._heading[1]))
            self._heading = None
        else:
            self._flush_text()


def extract_main_blocks(html: str) -> List[Dict[str, Any]]:
    """Parse ``html`` and return the ordered main-content blocks.

    Each block: ``{"kind": "heading"|"text"|"list"|"table", "text": str,
    "level": int, "link_chars": int}`` (+ ``headers``/``rows`` for tables).
    Boilerplate subtrees are dropped during the parse; link-dense short
    flowing blocks are pruned afterwards.  Never raises on malformed input.
    """
    parser = _MainContentParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:  # pragma: no cover - HTMLParser is raise-free in
        pass  # practice; belt-and-braces for exotic inputs
    kept = []
    for b in parser.blocks:
        if b["kind"] in ("text", "list"):
            total = b.get("content_chars", len(b["text"]))
            words = b["text"].count(" ") + 1 if b["text"] else 0
            if (
                total
                and b["link_chars"] / total > _LINK_DENSITY_MAX
                and words < _LINK_DENSITY_MIN_WORDS
            ):
                continue
        kept.append(b)
    # readability-style scoping: when the page declares a main-content
    # container (<main>/<article>/role="main") and it produced blocks,
    # everything outside it is chrome — comments sections, text-dense
    # footers and other unmarked junk included
    if any(b["in_main"] for b in kept):
        kept = [b for b in kept if b["in_main"]]
    return kept


_HTML_START_RE = re.compile(r"<(?:!|/?[a-zA-Z])")


def looks_like_html(stripped: str) -> bool:
    """Cheap dispatch test for a payload that is markup, not prose/JSON."""
    return stripped[:1] == "<" and _HTML_START_RE.match(stripped) is not None


def html_to_elements(html: str, output_format: str = "html"):
    """Extract main content and lay it out onto the deterministic synthetic
    pages the prose path uses, emitting the same element types the layout
    decoder produces — so the full node pipeline runs unchanged on HTML
    turns."""
    from open_parse_spark.core.model import Bbox, LineElement, TableElement, TextSpan
    from open_parse_spark.core.payload import (
        _PROSE_CHAR_WIDTH,
        _PROSE_LINE_HEIGHT,
        _PROSE_MARGIN_X,
        _PROSE_MIN_Y,
        _PROSE_PARA_GAP,
        _PROSE_TOP_Y,
        DEFAULT_PAGE_HEIGHT,
        DEFAULT_PAGE_WIDTH,
        ProseTextElement,
    )
    from open_parse_spark.functions.tables import (
        clean_headers,
        output_to_html,
        output_to_markdown,
    )

    def wrap78(text: str) -> List[str]:
        out: List[str] = []
        for src in text.split("\n"):
            if len(src) <= 78:
                out.append(src)
            else:
                out.extend(src[s : s + 78] for s in range(0, len(src), 78))
        return out

    elements = []
    page = 0
    y1 = _PROSE_TOP_Y
    for b in extract_main_blocks(html):
        if b["kind"] == "table":
            headers = clean_headers(list(b["headers"]))
            rows = b["rows"]
            if output_format in ("str", "markdown"):
                text = output_to_markdown(headers, rows)
            else:
                text = output_to_html(headers, rows)
            n_lines = max(1, len(rows) + (1 if headers else 0))
            needed = n_lines * _PROSE_LINE_HEIGHT
            if y1 - needed < _PROSE_MIN_Y:
                page += 1
                y1 = _PROSE_TOP_Y
            elements.append(
                TableElement(
                    text=text,
                    bbox=Bbox(
                        page=page,
                        page_width=DEFAULT_PAGE_WIDTH,
                        page_height=DEFAULT_PAGE_HEIGHT,
                        x0=_PROSE_MARGIN_X,
                        y0=y1 - needed,
                        x1=DEFAULT_PAGE_WIDTH - _PROSE_MARGIN_X,
                        y1=y1,
                    ),
                )
            )
            y1 = (y1 - needed) - _PROSE_PARA_GAP
            continue
        if b["kind"] == "heading":
            size = _HEADING_SIZES.get(f"h{b['level']}", 16.0)
            line_h = size + 4.0
            raw_lines = wrap78(b["text"])
            needed = len(raw_lines) * line_h
            if y1 - needed < _PROSE_MIN_Y:
                page += 1
                y1 = _PROSE_TOP_Y
            lines = tuple(
                LineElement(
                    bbox=(
                        _PROSE_MARGIN_X,
                        (y1 - i * line_h) - (line_h - 2.0),
                        _PROSE_MARGIN_X
                        + max(1.0, _PROSE_CHAR_WIDTH * len(t)),
                        y1 - i * line_h,
                    ),
                    spans=(
                        TextSpan(
                            text=t, is_bold=True, is_italic=False, size=size
                        ),
                    ),
                )
                for i, t in enumerate(raw_lines)
            )
            from open_parse_spark.core.model import TextElement
            from open_parse_spark.core.spans import get_lines_bbox

            x0, y0, x1, _ = get_lines_bbox(list(lines))
            elements.append(
                TextElement(
                    text="\n".join(line.text for line in lines),
                    lines=lines,
                    bbox=Bbox(
                        page=page,
                        page_width=DEFAULT_PAGE_WIDTH,
                        page_height=DEFAULT_PAGE_HEIGHT,
                        x0=float(x0),
                        y0=float(y0),
                        x1=float(x1),
                        y1=float(y1),
                    ),
                )
            )
            y1 = float(y0) - _PROSE_PARA_GAP
            continue
        # text / list blocks: same construction as the prose path
        from open_parse_spark.core.model import clean_markdown_formatting

        if b.get("runs"):
            # inline bold/italic: one line of style-run TextSpans — the
            # reference's span-transition markdown formatting applies
            # (model.py TextSpan.formatted_text); styled paragraphs are
            # short enough that forgoing the 78-char wrap is the right
            # trade against splitting a style run across lines
            needed = _PROSE_LINE_HEIGHT
            if y1 - needed < _PROSE_MIN_Y:
                page += 1
                y1 = _PROSE_TOP_Y
            total_len = sum(len(t) for t, _, _ in b["runs"])
            bbox = (
                _PROSE_MARGIN_X,
                y1 - (_PROSE_LINE_HEIGHT - 2.0),
                _PROSE_MARGIN_X + max(1.0, _PROSE_CHAR_WIDTH * total_len),
                y1,
            )
            line = LineElement(
                bbox=bbox,
                spans=tuple(
                    TextSpan(text=t, is_bold=bo, is_italic=it, size=11.0)
                    for t, bo, it in b["runs"]
                ),
            )
            from open_parse_spark.core.model import TextElement

            elements.append(
                TextElement(
                    text=line.text,
                    lines=(line,),
                    bbox=Bbox(
                        page=page,
                        page_width=DEFAULT_PAGE_WIDTH,
                        page_height=DEFAULT_PAGE_HEIGHT,
                        x0=bbox[0],
                        y0=bbox[1],
                        x1=bbox[2],
                        y1=bbox[3],
                    ),
                )
            )
            y1 = bbox[1] - _PROSE_PARA_GAP
            continue
        raw_lines = wrap78(b["text"])
        if not raw_lines:
            continue
        needed = len(raw_lines) * _PROSE_LINE_HEIGHT
        if y1 - needed < _PROSE_MIN_Y:
            page += 1
            y1 = _PROSE_TOP_Y
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
