"""Pipeline-step goldens, ported from the reference's pytest suite
(``/root/reference/src/tests/processing/test_steps.py:80-549``)."""

import pytest

from open_parse_spark.core.model import (
    ELEMENT_DELIMETER,
    Bbox,
    LineElement,
    Node,
    TableElement,
    TextElement,
    TextSpan,
)
from open_parse_spark.core.transforms import (
    combine_bullets,
    combine_headings_with_closest_text,
    combine_nodes_spatially,
    remove_full_page_stubs,
    remove_nodes_below_n_tokens,
    remove_repeated_elements,
    remove_text_inside_tables,
)


def create_text_node(text, x0, y0, x1, y1, page=1):
    return Node(
        elements=(
            TextElement(
                text=text,
                lines=(),
                bbox=Bbox(
                    x0=x0,
                    y0=y0,
                    x1=x1,
                    y1=y1,
                    page=page,
                    page_height=5000,
                    page_width=5000,
                ),
            ),
        )
    )


def create_table_node(x0, y0, x1, y1, page=1):
    return Node(
        elements=(
            TableElement(
                text="",
                bbox=Bbox(
                    x0=x0,
                    y0=y0,
                    x1=x1,
                    y1=y1,
                    page=page,
                    page_height=5000,
                    page_width=5000,
                ),
            ),
        )
    )


def texts(nodes):
    return ["".join(e.text for e in n.elements) for n in nodes]


# --- RemoveTextInsideTables (test_steps.py:80-141) ---


def test_no_tables_in_document():
    nodes = [create_text_node("Sample text", 0, 0, 10, 10)]
    assert remove_text_inside_tables(nodes) == nodes


def test_text_outside_tables():
    nodes = [
        create_table_node(50, 50, 100, 100),
        create_text_node("Outside text", 10, 10, 20, 20),
    ]
    assert remove_text_inside_tables(nodes) == nodes


def test_text_inside_tables():
    nodes = [
        create_table_node(50, 50, 100, 100),
        create_text_node("Inside text", 60, 60, 70, 70),
    ]
    assert remove_text_inside_tables(nodes) == [nodes[0]]


def test_text_on_table_border():
    nodes = [
        create_table_node(50, 50, 100, 100),
        create_text_node("Border text", 50, 50, 100, 100),
    ]
    assert remove_text_inside_tables(nodes) == [nodes[0]]


def test_overlapping_tables():
    nodes = [
        create_table_node(40, 40, 80, 80),
        create_table_node(60, 60, 100, 100),
        create_text_node("Overlapping text", 70, 70, 75, 75),
    ]
    assert remove_text_inside_tables(nodes) == nodes[:2]


def test_empty_tables():
    nodes = [create_table_node(50, 50, 100, 100)]
    assert remove_text_inside_tables(nodes) == nodes


def test_multi_page_documents():
    nodes = [
        create_table_node(50, 50, 100, 100, page=1),
        create_text_node("Page 1 text", 60, 60, 70, 70, page=1),
        create_text_node("Page 2 text", 60, 60, 70, 70, page=2),
    ]
    assert remove_text_inside_tables(nodes) == [nodes[0], nodes[2]]


# --- RemoveFullPageStubs (test_steps.py:147-179) ---


def test_full_page_stub_dropped():
    # 3500x3500 on a 5000x5000 page = 49% > 1%, and "small heading" is a stub
    node = create_text_node("small heading", 0, 0, 3500, 3500)
    assert remove_full_page_stubs(max_area_pct=0.01)([node]) == []


def test_full_page_non_stub_kept():
    # big text -> not a stub -> kept despite area
    node = create_text_node("word " * 200, 0, 0, 3500, 3500)
    assert remove_full_page_stubs(max_area_pct=0.01)([node]) == [node]


def test_small_area_stub_kept():
    # area below threshold -> kept even though stub
    node = create_text_node("tiny", 0, 0, 10, 10)
    assert remove_full_page_stubs(max_area_pct=0.01)([node]) == [node]


def test_multi_page_node_kept():
    node = Node(
        elements=(
            create_text_node("a", 0, 0, 3500, 3500, page=1).elements[0],
            create_text_node("b", 0, 0, 3500, 3500, page=2).elements[0],
        )
    )
    assert remove_full_page_stubs(max_area_pct=0.01)([node]) == [node]


# --- RemoveRepeatedElements (test_steps.py:185-207) ---


def test_remove_repeated_elements():
    bb = dict(x0=0, y0=0, x1=10, y1=10)
    nodes = [
        create_text_node("Hello, world!", **bb),
        create_text_node("Hello, world!", **bb),
        create_text_node("Unique text", **bb),
        create_text_node("Hello, world!", **bb),
        create_text_node("Another unique text", **bb),
    ]
    out = remove_repeated_elements(threshold=2)(nodes)
    assert {n.text for n in out} == {"Unique text", "Another unique text"}


# --- RemoveNodesBelowNTokens (test_steps.py:213-236) ---


def test_remove_nodes_below_n_tokens():
    bb = dict(x0=0, y0=0, x1=10, y1=10)
    nodes = [
        create_text_node("Hello, world!" * 100, **bb),
        create_text_node("Hi!", **bb),
        create_text_node("Unique text" * 100, **bb),
        create_text_node("Bye", **bb),
        create_text_node("Another unique text" * 100, **bb),
    ]
    out = remove_nodes_below_n_tokens(min_tokens=50)(nodes)
    assert {n.text for n in out} == {
        "Hello, world!" * 100,
        "Unique text" * 100,
        "Another unique text" * 100,
    }


# --- CombineNodesSpatially (test_steps.py:242-296) ---


def test_combine_nodes_spatially_both_small():
    nodes = [
        create_text_node("Node 1", 0, 0, 100, 100),
        create_text_node("Node 2", 80, 80, 180, 180),
        create_text_node("Non-overlapping", 2000, 2000, 3000, 3000),
    ]
    out = combine_nodes_spatially(
        x_error_margin=30, y_error_margin=30, criteria="both_small"
    )(nodes)
    assert len(out) == 2
    assert set(texts(out)) == {"Node 1Node 2", "Non-overlapping"}


def test_combine_nodes_one_stub_one_small():
    nodes = [
        create_text_node("stub", 0, 0, 50, 50),
        create_text_node("small " * 10, 40, 40, 140, 140),
        create_text_node("non-overlapping " * 100, 300, 300, 400, 400),
    ]
    out = combine_nodes_spatially(
        x_error_margin=30, y_error_margin=30, criteria="either_stub"
    )(nodes)
    assert len(out) == 2
    combined = " ".join(n.text for n in out)
    assert "stub" in combined and "small " * 10 in combined


# --- CombineBullets (test_steps.py:302-420) ---


def _node(text):
    return Node(
        elements=(
            TextElement(
                text=text,
                lines=(),
                bbox=Bbox(
                    page=0,
                    page_height=792.0,
                    page_width=612.0,
                    x0=18.22,
                    y0=659.1,
                    x1=594.0,
                    y1=711.3,
                ),
            ),
        )
    )


@pytest.fixture
def node_without_bullets():
    return _node("Some text without bullet points.")


@pytest.fixture
def node_starts_with_bullet():
    return _node(
        f"- Bullet point at the start.{ELEMENT_DELIMETER}\n other text that follows."
    )


@pytest.fixture
def node_ends_with_bullet():
    return _node(f"Text ending with a bullet point:\n{ELEMENT_DELIMETER}- Bullet")


@pytest.fixture
def node_with_multiple_bullets():
    return _node(
        f"- Bullet one{ELEMENT_DELIMETER}- Bullet two{ELEMENT_DELIMETER}- Bullet three"
    )


def test_combine_bullets_single_node(node_without_bullets):
    assert len(combine_bullets([node_without_bullets])) == 1


def test_combine_bullets_sequential(node_starts_with_bullet, node_ends_with_bullet):
    out = combine_bullets([node_ends_with_bullet, node_starts_with_bullet])
    assert len(out) == 1


def test_combine_bullets_no_combination(node_without_bullets, node_starts_with_bullet):
    out = combine_bullets([node_without_bullets, node_starts_with_bullet])
    assert len(out) == 2


def test_combine_bullets_multiple_nodes(
    node_starts_with_bullet, node_with_multiple_bullets, node_ends_with_bullet
):
    out = combine_bullets(
        [node_starts_with_bullet, node_with_multiple_bullets, node_ends_with_bullet]
    )
    assert len(out) == 3


def test_combine_multiple_sequential_bullets(
    node_starts_with_bullet, node_ends_with_bullet
):
    nodes = [
        node_ends_with_bullet,
        node_starts_with_bullet,
        node_ends_with_bullet,
        node_starts_with_bullet,
    ]
    assert len(combine_bullets(nodes)) == 2


# --- CombineHeadingsWithClosestText (test_steps.py:426-548) ---


def _heading_node():
    line = LineElement(
        bbox=(0, 0, 100, 20),
        spans=(
            TextSpan(
                text="**Heading Example**", is_bold=True, is_italic=False, size=18
            ),
        ),
    )
    el = TextElement(
        text="**Heading Example**",
        lines=(line,),
        bbox=Bbox(
            page=0,
            page_height=792.0,
            page_width=612.0,
            x0=18.22,
            y0=659.1,
            x1=594.0,
            y1=711.3,
        ),
    )
    return Node(elements=(el,))


def _short_text_node():
    line = LineElement(
        bbox=(0, 30, 100, 50),
        spans=(
            TextSpan(
                text="This is some short text that follows a heading.",
                is_bold=False,
                is_italic=False,
                size=12,
            ),
        ),
    )
    el = TextElement(
        text="This is some short text that follows a heading.",
        lines=(line,),
        bbox=Bbox(
            page=0,
            page_height=792.0,
            page_width=612.0,
            x0=18.22,
            y0=679.1,
            x1=594.0,
            y1=731.3,
        ),
    )
    return Node(elements=(el,))


def _longer_text_node():
    line = LineElement(
        bbox=(0, 60, 200, 100),
        spans=(
            TextSpan(
                text="This is a longer piece of text intended as content under a heading.",
                is_bold=False,
                is_italic=False,
                size=12,
            ),
        ),
    )
    el = TextElement(
        text="This is a longer piece of text intended as content under a heading.",
        lines=(line,),
        bbox=Bbox(
            page=0,
            page_height=792.0,
            page_width=612.0,
            x0=18.22,
            y0=699.1,
            x1=594.0,
            y1=751.3,
        ),
    )
    assert el.is_heading is False
    node = Node(elements=(el,))
    assert node.is_heading is False
    return node


def test_combine_heading_with_next_text():
    nodes = [_heading_node(), _short_text_node(), _longer_text_node()]
    out = combine_headings_with_closest_text(nodes)
    assert len(out) == 2
    combined = "".join(e.text for e in out[0].elements)
    assert "**Heading Example**" in combined
    assert "This is some short text" in combined
    remaining = "".join(e.text for e in out[1].elements)
    assert "This is a longer piece of text" in remaining


def test_no_combine_when_no_heading():
    nodes = [_short_text_node(), _longer_text_node()]
    assert len(combine_headings_with_closest_text(nodes)) == 2
