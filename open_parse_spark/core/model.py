"""Core document model — spans, lines, elements, nodes.

A from-scratch, dependency-free (no pydantic) reimplementation of the
observable semantics of the reference's schemas
(``/root/reference/src/openparse/schemas.py``).  Used in two places with the
*same code path*:

1. the single-threaded oracle that freezes golden outputs for tests, and
2. inside the Arrow ``mapInPandas`` UDF of the distributed Spark pipeline.

Per-turn node counts are tiny (10^0..10^2), so plain Python objects here are
not a hot path concern — parallelism is across turns, handled by Spark.

Equality-critical details preserved (see SURVEY.md §4.3):
- markdown style-transition markers + 5 regex cleanups (schemas.py:86-106,160-187)
- line bbox rounded to 2dp (schemas.py:116-119)
- line is_bold/is_italic/is_heading ignore trailing span when >1 (schemas.py:140-158)
- heading threshold: size >= 16 and bold (schemas.py:81-84)
- Node.text element sort (page, -y1, x0) + join rules |dy0|<=1 -> " ",
  <=12 -> "\\n", else "<br><br>"; tables never relate (schemas.py:403-424,499-524)
- reading order (min_page, -min_y0, min_x0) (schemas.py:579-598)
- strict-inequality table intersection vs margin overlap (SURVEY §4.3.2)
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

from open_parse_spark.core.tokens import num_tokens


class cached_property:  # noqa: N801 — drop-in for functools.cached_property
    """Lock-free cached property.

    Python 3.11's ``functools.cached_property`` acquires an RLock on every
    first access; pipeline transforms create fresh ``Node`` objects per merge
    step, so in the parse hot path virtually ALL property accesses are first
    touches (~40 per turn) and the lock+checks were ~10% of parse CPU.
    Python workers evaluate a task single-threaded, and every property here
    is a pure function of immutable state, so an (impossible) race would only
    recompute the same value."""

    __slots__ = ("func", "attrname", "doc")

    def __init__(self, func):
        self.func = func
        self.attrname = None
        self.doc = func.__doc__

    def __set_name__(self, owner, name):
        self.attrname = name

    def __get__(self, instance, owner=None):
        if instance is None:
            return self
        val = self.func(instance)
        instance.__dict__[self.attrname] = val
        return val

# Reference: consts.py:3-6
TOKENIZATION_LOWER_LIMIT = 256
TOKENIZATION_UPPER_LIMIT = 1024
ELEMENT_DELIMETER = "<br><br>"
STUB_TOKEN_LIMIT = 50  # schemas.py:557
MIN_HEADING_SIZE = 16  # schemas.py:83

# Reference: schemas.py:14-16
bullet_regex = re.compile(
    r"^(\s*[\-•](?!\*)|\s*\*(?!\*)|\s*\d+\.\s|\s*\([a-zA-Z0-9]+\)\s|\s*[a-zA-Z]\.\s)"
)

# Reference: LineElement._clean_markdown_formatting patterns, schemas.py:160-187
_MD_CLEANUP = [
    (re.compile(r"(\*\*|__)\s+"), r"\1"),
    (re.compile(r"\s+(\*\*|__)"), r"\1"),
    (re.compile(r"(\*|_)\s+"), r"\1"),
    (re.compile(r"\s+(\*|_)"), r"\1"),
    (re.compile(r"(\*\*|__)(\*\*|__)"), r"\1 \2"),
]


def clean_markdown_formatting(text: str) -> str:
    """Reference: schemas.py:160-187 (ordered regex cleanup).

    Fast path: every pattern requires a ``*`` or ``_`` to match, so text
    without either character is returned unchanged (semantics identical)."""
    if "*" not in text and "_" not in text:
        return text
    for pattern, replacement in _MD_CLEANUP:
        text = pattern.sub(replacement, text)
    return text


class Bbox:
    """Reference: schemas.py:27-67 (bottom-left coordinates, consts.py:5).

    Plain __slots__ class, not a frozen dataclass: construction sits in the
    per-element decode/merge hot path and object.__setattr__-based frozen
    init measured ~4x slower (treated as immutable by convention; eq/hash
    match the old dataclass semantics)."""

    __slots__ = ("page", "page_height", "page_width", "x0", "y0", "x1", "y1")

    def __init__(self, page, page_height, page_width, x0, y0, x1, y1):
        self.page = page
        self.page_height = page_height
        self.page_width = page_width
        self.x0 = x0
        self.y0 = y0
        self.x1 = x1
        self.y1 = y1

    def _key(self):
        return (
            self.page, self.page_height, self.page_width,
            self.x0, self.y0, self.x1, self.y1,
        )

    def __eq__(self, other):
        return isinstance(other, Bbox) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):
        return (
            f"Bbox(page={self.page!r}, page_height={self.page_height!r}, "
            f"page_width={self.page_width!r}, x0={self.x0!r}, y0={self.y0!r}, "
            f"x1={self.x1!r}, y1={self.y1!r})"
        )

    @property
    def area(self) -> float:
        return (self.x1 - self.x0) * (self.y1 - self.y0)

    def combine(self, other: "Bbox") -> "Bbox":
        if self.page != other.page:
            raise ValueError("Bboxes must be from the same page to combine.")
        return Bbox(
            page=self.page,
            page_height=self.page_height,
            page_width=self.page_width,
            x0=min(self.x0, other.x0),
            y0=min(self.y0, other.y0),
            x1=max(self.x1, other.x1),
            y1=max(self.y1, other.y1),
        )


class TextSpan:
    """Reference: schemas.py:75-108.  Slots class for the same hot-path
    construction reason as :class:`Bbox`."""

    __slots__ = ("text", "is_bold", "is_italic", "size")

    def __init__(self, text, is_bold, is_italic, size):
        self.text = text
        self.is_bold = is_bold
        self.is_italic = is_italic
        self.size = size

    def __eq__(self, other):
        return (
            isinstance(other, TextSpan)
            and self.text == other.text
            and self.is_bold == other.is_bold
            and self.is_italic == other.is_italic
            and self.size == other.size
        )

    def __hash__(self):
        return hash((self.text, self.is_bold, self.is_italic, self.size))

    def __repr__(self):
        return (
            f"TextSpan(text={self.text!r}, is_bold={self.is_bold!r}, "
            f"is_italic={self.is_italic!r}, size={self.size!r})"
        )

    @property
    def is_heading(self) -> bool:
        return self.size >= MIN_HEADING_SIZE and self.is_bold

    def formatted_text(
        self,
        previous_span: Optional["TextSpan"] = None,
        next_span: Optional["TextSpan"] = None,
    ) -> str:
        """Style-transition markdown markers; reference schemas.py:86-106."""
        formatted = self.text
        if self.is_bold and (previous_span is None or not previous_span.is_bold):
            formatted = f"**{formatted}"
        if self.is_italic and (previous_span is None or not previous_span.is_italic):
            formatted = f"*{formatted}"
        if self.is_bold and (next_span is None or not next_span.is_bold):
            formatted = f"{formatted}**"
        if self.is_italic and (next_span is None or not next_span.is_italic):
            formatted = f"{formatted}*"
        return formatted


class LineElement:
    """Reference: schemas.py:111-223. Bbox rounded to 2dp at construction."""

    __slots__ = ("bbox", "spans", "_text")

    def __init__(self, bbox: Sequence[float], spans: Sequence[TextSpan]):
        b0, b1, b2, b3 = bbox
        self.bbox: Tuple[float, float, float, float] = (
            round(b0, 2), round(b1, 2), round(b2, 2), round(b3, 2),
        )  # schemas.py:116-119
        self.spans: Tuple[TextSpan, ...] = tuple(spans)
        self._text: Optional[str] = None

    @property
    def text(self) -> str:
        """Markdown-assembled span text; reference schemas.py:122-138."""
        if self._text is None:
            combined = "".join(
                span.formatted_text(
                    self.spans[i - 1] if i > 0 else None,
                    self.spans[i + 1] if i < len(self.spans) - 1 else None,
                )
                for i, span in enumerate(self.spans)
            )
            self._text = clean_markdown_formatting(combined)
        return self._text

    def _style_spans(self) -> Tuple[TextSpan, ...]:
        # ignore last span for formatting when >1 span (schemas.py:140-158)
        return self.spans[:-1] if len(self.spans) > 1 else self.spans

    @property
    def is_bold(self) -> bool:
        return all(s.is_bold for s in self._style_spans())

    @property
    def is_italic(self) -> bool:
        return all(s.is_italic for s in self._style_spans())

    @property
    def is_heading(self) -> bool:
        return all(
            s.size >= MIN_HEADING_SIZE and s.is_bold for s in self._style_spans()
        )

    def overlaps(self, other: "LineElement", error_margin: float = 0.0) -> bool:
        """Reference: schemas.py:189-200 (non-strict margin overlap)."""
        x_overlap = not (
            self.bbox[0] - error_margin > other.bbox[2] + error_margin
            or other.bbox[0] - error_margin > self.bbox[2] + error_margin
        )
        y_overlap = not (
            self.bbox[1] - error_margin > other.bbox[3] + error_margin
            or other.bbox[1] - error_margin > self.bbox[3] + error_margin
        )
        return x_overlap and y_overlap

    def is_at_similar_height(
        self, other: "LineElement", error_margin: float = 0.0
    ) -> bool:
        return abs(self.bbox[1] - other.bbox[1]) <= error_margin

    def combine(self, other: "LineElement") -> "LineElement":
        new_bbox = (
            min(self.bbox[0], other.bbox[0]),
            min(self.bbox[1], other.bbox[1]),
            max(self.bbox[2], other.bbox[2]),
            max(self.bbox[3], other.bbox[3]),
        )
        return LineElement(bbox=new_bbox, spans=self.spans + other.spans)


class _ElementBase:
    """Shared element surface: text, bbox, variant, tokens."""

    variant: str = "text"
    text: str
    bbox: Bbox

    @property
    def embed_text(self) -> str:  # schemas.py:233-239 (no override path used)
        return self.text

    @property
    def page(self) -> int:
        return self.bbox.page

    @property
    def area(self) -> float:
        return (self.bbox.x1 - self.bbox.x0) * (self.bbox.y1 - self.bbox.y0)

    def is_at_similar_height(self, other: "_ElementBase", error_margin: float = 1) -> bool:
        return abs(self.bbox.y1 - other.bbox.y1) <= error_margin


class TextElement(_ElementBase):
    """Reference: schemas.py:226-289."""

    variant = "text"
    __slots__ = ("text", "lines", "bbox", "_tokens")

    def __init__(self, text: str, lines: Sequence[LineElement], bbox: Bbox):
        self.text = text
        self.lines: Tuple[LineElement, ...] = tuple(lines)
        self.bbox = bbox
        self._tokens: Optional[int] = None

    @property
    def tokens(self) -> int:
        if self._tokens is None:
            self._tokens = num_tokens(self.text)
        return self._tokens

    @property
    def is_heading(self) -> bool:
        return all(line.is_heading for line in self.lines)

    @property
    def is_bold(self) -> bool:
        return all(line.is_bold for line in self.lines)

    def overlaps(
        self,
        other: "TextElement",
        x_error_margin: float = 0.0,
        y_error_margin: float = 0.0,
    ) -> bool:
        """Reference: schemas.py:270-287 (same page only, margin overlap)."""
        if self.page != other.page:
            return False
        x_overlap = not (
            self.bbox.x0 - x_error_margin > other.bbox.x1 + x_error_margin
            or other.bbox.x0 - x_error_margin > self.bbox.x1 + x_error_margin
        )
        y_overlap = not (
            self.bbox.y0 - y_error_margin > other.bbox.y1 + y_error_margin
            or other.bbox.y0 - y_error_margin > self.bbox.y1 + y_error_margin
        )
        return x_overlap and y_overlap


class TableElement(_ElementBase):
    """Reference: schemas.py:297-330 — a table is its serialized string."""

    variant = "table"
    __slots__ = ("text", "bbox", "_tokens")

    def __init__(self, text: str, bbox: Bbox):
        self.text = text
        self.bbox = bbox
        self._tokens: Optional[int] = None

    @property
    def tokens(self) -> int:
        if self._tokens is None:
            self._tokens = num_tokens(self.text)
        return self._tokens


class ImageElement(_ElementBase):
    """Reference: schemas.py:338-395. ``tokens`` fixed at 512 (:373-375)."""

    variant = "image"
    __slots__ = ("text", "bbox", "image", "image_mimetype")

    def __init__(self, text: str, bbox: Bbox, image: str, image_mimetype: str):
        self.text = text
        self.bbox = bbox
        self.image = image
        self.image_mimetype = image_mimetype

    @property
    def tokens(self) -> int:
        return 512

    def overlaps(self, other: "ImageElement", buffer: float = 1.0) -> bool:
        """Reference: schemas.py:385-395."""
        if self.bbox.page != other.bbox.page:
            return False
        return not (
            self.bbox.x1 + buffer < other.bbox.x0 - buffer
            or self.bbox.x0 - buffer > other.bbox.x1 + buffer
            or self.bbox.y1 + buffer < other.bbox.y0 - buffer
            or self.bbox.y0 - buffer > other.bbox.y1 + buffer
        )


Element = _ElementBase  # type alias for annotations


def _determine_relationship(elem1: Element, elem2: Element) -> Optional[str]:
    """Reference: schemas.py:403-424. Tables never relate."""
    if elem1.variant == "table" or elem2.variant == "table":
        return None
    vertical_distance = abs(elem1.bbox.y0 - elem2.bbox.y0)
    if vertical_distance <= 1:
        return "same-line"
    elif vertical_distance <= 12:
        return "same-paragraph"
    return None


class Node:
    """Reference: schemas.py:427-678.

    Deterministic: no uuid (SURVEY §4.3.5) — identity is positional
    ``(conv_id, turn_idx, node_idx)`` assigned at output time.
    """

    __slots__ = ("elements", "__dict__")

    def __init__(self, elements: Sequence[Element]):
        self.elements: Tuple[Element, ...] = tuple(elements)

    @cached_property
    def variant(self) -> frozenset:
        return frozenset(e.variant for e in self.elements)

    @cached_property
    def tokens(self) -> int:
        if len(self.elements) == 1:
            return self.elements[0].tokens
        return sum(e.tokens for e in self.elements)

    @cached_property
    def bbox(self) -> List[Bbox]:
        """Per-page union in first-seen page order; reference schemas.py:469-497."""
        if len(self.elements) == 1:
            # single element: the per-page union IS its (already-validated)
            # bbox — value-identical to the general fold below
            return [self.elements[0].bbox]
        elements_by_page: Dict[int, List[Element]] = {}
        for element in self.elements:
            elements_by_page.setdefault(element.bbox.page, []).append(element)
        bboxes = []
        for page, elements in elements_by_page.items():
            bboxes.append(
                Bbox(
                    page=page,
                    page_height=elements[0].bbox.page_height,
                    page_width=elements[0].bbox.page_width,
                    x0=min(e.bbox.x0 for e in elements),
                    y0=min(e.bbox.y0 for e in elements),
                    x1=max(e.bbox.x1 for e in elements),
                    y1=max(e.bbox.y1 for e in elements),
                )
            )
        return bboxes

    @cached_property
    def text(self) -> str:
        """Reference: schemas.py:499-524 — element sort + join rules."""
        if len(self.elements) == 1:
            return self.elements[0].embed_text
        sorted_elements = sorted(
            self.elements, key=lambda e: (e.page, -e.bbox.y1, e.bbox.x0)
        )
        texts: List[str] = []
        for i, current in enumerate(sorted_elements):
            if i > 0:
                relationship = _determine_relationship(sorted_elements[i - 1], current)
                if relationship == "same-line":
                    texts.append(" ")
                elif relationship == "same-paragraph":
                    texts.append("\n")
                else:
                    texts.append(ELEMENT_DELIMETER)
            texts.append(current.embed_text)
        return "".join(texts)

    @cached_property
    def is_heading(self) -> bool:
        """Reference: schemas.py:526-533."""
        if self.variant != frozenset({"text"}):
            return False
        if not self.is_stub:
            return False
        return all(e.is_heading or e.is_bold for e in self.elements)

    @cached_property
    def starts_with_bullet(self) -> bool:
        first_line = self.text.split(ELEMENT_DELIMETER)[0].strip()
        if not first_line:
            return False
        return bool(bullet_regex.match(first_line))

    @cached_property
    def ends_with_bullet(self) -> bool:
        last_line = self.text.split(ELEMENT_DELIMETER)[-1].strip()
        if not last_line:
            return False
        return bool(bullet_regex.match(last_line))

    @cached_property
    def is_stub(self) -> bool:
        return self.tokens < STUB_TOKEN_LIMIT

    @cached_property
    def is_small(self) -> bool:
        return self.tokens < TOKENIZATION_LOWER_LIMIT

    @cached_property
    def is_large(self) -> bool:
        return self.tokens > TOKENIZATION_UPPER_LIMIT

    @cached_property
    def num_pages(self) -> int:
        if len(self.elements) == 1:
            return 1
        return len({e.bbox.page for e in self.elements})

    @cached_property
    def start_page(self) -> int:
        if len(self.elements) == 1:
            return self.elements[0].bbox.page
        return min(e.bbox.page for e in self.elements)

    @cached_property
    def end_page(self) -> int:
        if len(self.elements) == 1:
            return self.elements[0].bbox.page
        return max(e.bbox.page for e in self.elements)

    @cached_property
    def reading_order(self) -> Tuple[int, float, float]:
        """Reference: schemas.py:579-598 — (min_page, -min_y0, min_x0)."""
        if len(self.elements) == 1:
            b = self.elements[0].bbox
            return (b.page, -b.y0, b.x0)
        return (
            min(e.bbox.page for e in self.elements),
            -min(e.bbox.y0 for e in self.elements),
            min(e.bbox.x0 for e in self.elements),
        )

    @cached_property
    def _bbox_flat(self) -> list:
        """(page, x0, y0, x1, y1) tuples — overlap checks run ~665k times per
        10k turns in the greedy spatial merge, and tuple unpacking beats five
        dataclass attribute loads per bbox there."""
        return [(b.page, b.x0, b.y0, b.x1, b.y1) for b in self.bbox]

    def overlaps(
        self, other: "Node", x_error_margin: float = 0.0, y_error_margin: float = 0.0
    ) -> bool:
        """Any-page-pair margin overlap; reference schemas.py:600-622."""
        for page, x0, y0, x1, y1 in self._bbox_flat:
            for opage, ox0, oy0, ox1, oy1 in other._bbox_flat:
                if opage != page:
                    continue
                if (
                    x0 - x_error_margin > ox1 + x_error_margin
                    or ox0 - x_error_margin > x1 + x_error_margin
                ):
                    continue
                if (
                    y0 - y_error_margin > oy1 + y_error_margin
                    or oy0 - y_error_margin > y1 + y_error_margin
                ):
                    continue
                return True
        return False

    def __lt__(self, other: "Node") -> bool:
        return self.reading_order < other.reading_order

    def __add__(self, other: "Node") -> "Node":
        """Reference: schemas.py:669-678 — element tuple concatenation.

        Merged-node derived state is pre-seeded from the parents' cached
        values where algebraically exact (tokens are additive, variants
        union, reading order is an elementwise min/max fold, per-page bboxes
        union in first-seen element order) — the greedy combine transforms
        create O(n) merged nodes per turn and re-deriving from scratch was
        the profile's top cost.  ``test_node_merge_preseed_differential``
        asserts preseeded == fresh for randomized merges."""
        merged = Node(elements=self.elements + other.elements)
        cache = merged.__dict__
        cache["tokens"] = self.tokens + other.tokens
        cache["variant"] = self.variant | other.variant
        a, b = self.reading_order, other.reading_order
        cache["reading_order"] = (
            min(a[0], b[0]),
            max(a[1], b[1]),
            min(a[2], b[2]),
        )
        # per-page union, first-seen page order: self's pages in order, then
        # other's new pages in order (reference iterates elements in order)
        by_page = {}
        for bb in self.bbox:
            by_page[bb.page] = bb
        for bb in other.bbox:
            if bb.page in by_page:
                by_page[bb.page] = by_page[bb.page].combine(bb)
            else:
                by_page[bb.page] = bb
        cache["bbox"] = list(by_page.values())
        cache["num_pages"] = len(by_page)
        cache["start_page"] = min(self.start_page, other.start_page)
        cache["end_page"] = max(self.end_page, other.end_page)
        return merged
