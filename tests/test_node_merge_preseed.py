"""Differential test: Node.__add__'s pre-seeded derived state must equal the
from-scratch derivation for randomized merges (multi-page, mixed variants)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from open_parse_spark.core.model import Bbox, Node, TableElement, TextElement


def element(page, x0, y0, w, h, text, table=False):
    bbox = Bbox(
        page=page,
        page_height=792.0,
        page_width=612.0,
        x0=x0,
        y0=y0,
        x1=x0 + w,
        y1=y0 + h,
    )
    if table:
        return TableElement(text=text, bbox=bbox)
    return TextElement(text=text, lines=(), bbox=bbox)


el_strategy = st.builds(
    element,
    page=st.integers(min_value=0, max_value=3),
    x0=st.floats(min_value=0, max_value=500, allow_nan=False),
    y0=st.floats(min_value=0, max_value=700, allow_nan=False),
    w=st.floats(min_value=1, max_value=100, allow_nan=False),
    h=st.floats(min_value=1, max_value=80, allow_nan=False),
    text=st.text(alphabet="abc xyz.", min_size=0, max_size=40),
    table=st.booleans(),
)


@settings(max_examples=60, deadline=None)
@given(
    ea=st.lists(el_strategy, min_size=1, max_size=5),
    eb=st.lists(el_strategy, min_size=1, max_size=5),
)
def test_node_merge_preseed_differential(ea, eb):
    a, b = Node(elements=tuple(ea)), Node(elements=tuple(eb))
    # touch parents' caches first (the preseed path reads them)
    _ = a.tokens, a.bbox, a.reading_order, b.tokens, b.bbox, b.reading_order
    merged = a + b
    fresh = Node(elements=tuple(ea) + tuple(eb))
    assert merged.tokens == fresh.tokens
    assert merged.variant == fresh.variant
    assert merged.reading_order == fresh.reading_order
    assert merged.num_pages == fresh.num_pages
    assert merged.start_page == fresh.start_page
    assert merged.end_page == fresh.end_page
    assert merged.text == fresh.text
    got = [(bb.page, bb.page_height, bb.page_width, bb.x0, bb.y0, bb.x1, bb.y1) for bb in merged.bbox]
    want = [(bb.page, bb.page_height, bb.page_width, bb.x0, bb.y0, bb.x1, bb.y1) for bb in fresh.bbox]
    assert got == want
    assert merged.is_stub == fresh.is_stub
    assert merged.is_heading == fresh.is_heading
    assert merged.starts_with_bullet == fresh.starts_with_bullet
