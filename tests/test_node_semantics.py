"""Node-level geometry / ordering / bullet goldens, ported from the
reference's pytest suite (``/root/reference/src/tests/test_schemas.py:276-580``)
plus the Node.text join rules (schemas.py:403-424,499-524)."""

import pytest

from open_parse_spark.core.model import (
    ELEMENT_DELIMETER,
    Bbox,
    LineElement,
    Node,
    TableElement,
    TextElement,
    bullet_regex,
)


def make_text_element(text, page, x0, y0, x1, y1, page_height=11, page_width=8.5):
    return TextElement(
        text=text,
        lines=(),
        bbox=Bbox(
            page=page,
            page_height=page_height,
            page_width=page_width,
            x0=x0,
            y0=y0,
            x1=x1,
            y1=y1,
        ),
    )


# --- line overlap (test_schemas.py:276-292) ---


@pytest.mark.parametrize(
    "bbox1, bbox2, error_margin, expected",
    [
        ((0, 0, 1, 1), (2, 2, 3, 3), 0, False),
        ((0, 0, 2, 2), (1, 1, 3, 3), 0, True),
        ((0, 0, 1, 1), (1, 1, 2, 2), 0, True),
        ((0, 0, 1, 1), (1.1, 1.1, 2.1, 2.1), 0.15, True),
    ],
)
def test_line_element_overlaps(bbox1, bbox2, error_margin, expected):
    e1 = LineElement(bbox=bbox1, spans=())
    e2 = LineElement(bbox=bbox2, spans=())
    assert e1.overlaps(e2, error_margin=error_margin) == expected


# --- element overlap incl. cross-page (test_schemas.py:295-341) ---


@pytest.mark.parametrize(
    "bbox1, bbox2, page1, page2, error_margin, expected",
    [
        ((0, 0, 1, 1), (2, 2, 3, 3), 1, 1, 0, False),
        ((0, 0, 2, 2), (1, 1, 3, 3), 1, 1, 0, True),
        ((0, 0, 1, 1), (1, 1, 2, 2), 1, 1, 0, True),
        ((0, 0, 1, 1), (1.1, 1.1, 2.1, 2.1), 1, 1, 0.15, True),
        ((0, 0, 1, 1), (0, 0, 1, 1), 1, 2, 0, False),
    ],
)
def test_text_element_overlaps(bbox1, bbox2, page1, page2, error_margin, expected):
    e1 = make_text_element("Element 1", page1, *bbox1)
    e2 = make_text_element("Element 2", page2, *bbox2)
    assert (
        e1.overlaps(e2, x_error_margin=error_margin, y_error_margin=error_margin)
        == expected
    )


# --- node multi-page bbox union (test_schemas.py:344-388) ---


def test_node_bbox_per_page_union():
    node = Node(
        elements=(
            make_text_element("a", 1, 50, 100, 150, 200, 800, 600),
            make_text_element("b", 1, 100, 150, 200, 250, 800, 600),
            make_text_element("c", 2, 60, 110, 160, 210, 800, 600),
        )
    )
    bboxes = node.bbox
    assert len(bboxes) == 2
    p1 = next(b for b in bboxes if b.page == 1)
    assert (p1.x0, p1.y0, p1.x1, p1.y1) == (50, 100, 200, 250)
    p2 = next(b for b in bboxes if b.page == 2)
    assert (p2.x0, p2.y0, p2.x1, p2.y1) == (60, 110, 160, 210)


# --- node overlap (test_schemas.py:391-451) ---


@pytest.mark.parametrize(
    "bbox1, bbox2, page1, page2, xm, ym, expected",
    [
        ((0, 0, 1, 1), (2, 2, 3, 3), 1, 1, 0, 0, False),
        ((0, 0, 2, 2), (1, 1, 3, 3), 1, 1, 0, 0, True),
        ((0, 0, 1, 1), (1, 1, 2, 2), 1, 1, 0, 0, True),
        ((0, 0, 1, 1), (0, 0, 1, 1), 1, 2, 0, 0, False),
        ((0, 0, 1, 1), (1.05, 1.05, 2.05, 2.05), 1, 1, 0.1, 0.1, True),
        ((0, 0, 3, 3), (1, 1, 2, 2), 1, 1, 0, 0, True),
    ],
)
def test_node_overlaps(bbox1, bbox2, page1, page2, xm, ym, expected):
    n1 = Node(elements=(make_text_element("1", page1, *bbox1),))
    n2 = Node(elements=(make_text_element("2", page2, *bbox2),))
    assert n1.overlaps(n2, x_error_margin=xm, y_error_margin=ym) == expected


# --- bullets (test_schemas.py:457-580) ---


@pytest.mark.parametrize(
    "case",
    [
        "- This is a dash bullet point",
        "• This is a bullet point",
        "* This is an asterisk bullet point",
        "1. This is a numbered bullet point",
        "(1) This is a parenthesized number bullet point",
        "(a) This is a parenthesized letter bullet point",
        "A. This is a lettered bullet point",
    ],
)
def test_bullet_match(case):
    assert bullet_regex.match(case) is not None


@pytest.mark.parametrize(
    "case",
    [
        "This is a regular line",
        ".1 This is not a numbered bullet point",
        "( 1) This format is not covered",
        "A- This is not a bullet point",
        "**RULE 10 - CLASSIFICATION**",
    ],
)
def test_bullet_no_match(case):
    assert bullet_regex.match(case) is None


def _bullet_node(text):
    return Node(
        elements=(
            make_text_element(text, 0, 18.22, 659.1, 594.0, 711.3, 792.0, 612.0),
        )
    )


def test_starts_ends_with_bullet():
    n = _bullet_node(
        "regulatory complexities. For example, several of our products are not "
        "generally available in China."
    )
    assert n.starts_with_bullet is False and n.ends_with_bullet is False

    n = _bullet_node(
        f"- This is the first bullet point. {ELEMENT_DELIMETER}"
        "Additional information follows the bullet point without a new bullet."
    )
    assert n.starts_with_bullet is True and n.ends_with_bullet is False

    n = _bullet_node(
        f"This is some introductory text. {ELEMENT_DELIMETER}"
        "- And this is a bullet point that concludes the text element."
    )
    assert n.starts_with_bullet is False and n.ends_with_bullet is True

    n = _bullet_node(
        f"- First bullet point starts the element. {ELEMENT_DELIMETER}"
        f"- Second bullet point follows.  {ELEMENT_DELIMETER}"
        f"Some intermediate text that doesn't start with a bullet. {ELEMENT_DELIMETER}"
        "- Third bullet point ends the element."
    )
    assert n.starts_with_bullet is True and n.ends_with_bullet is True


# --- Node.text join rules (schemas.py:403-424,499-524; FIXTURES F7) ---


def test_node_text_join_rules():
    # same-line: |dy0| <= 1 -> " "; same-paragraph: <= 12 -> "\n"; else <br><br>
    a = make_text_element("alpha", 0, 10, 700, 100, 712, 792, 612)
    b = make_text_element("beta", 0, 110, 700.5, 200, 712, 792, 612)  # same line
    c = make_text_element("gamma", 0, 10, 690, 100, 698, 792, 612)  # same paragraph
    d = make_text_element("delta", 0, 10, 100, 100, 112, 792, 612)  # distant
    node = Node(elements=(d, c, b, a))  # shuffled: text sorts by (page,-y1,x0)
    assert node.text == "alpha beta\ngamma<br><br>delta"


def test_node_text_tables_never_relate():
    a = make_text_element("text", 0, 10, 700, 100, 712, 792, 612)
    t = TableElement(
        text="| a |",
        bbox=Bbox(
            page=0, page_height=792, page_width=612, x0=10, y0=699.5, x1=100, y1=699.9
        ),
    )
    node = Node(elements=(a, t))
    assert node.text == "text<br><br>| a |"


def test_reading_order_sort():
    n1 = Node(elements=(make_text_element("p0-top", 0, 10, 700, 100, 712, 792, 612),))
    n2 = Node(elements=(make_text_element("p0-bot", 0, 10, 100, 100, 112, 792, 612),))
    n3 = Node(elements=(make_text_element("p1", 1, 10, 700, 100, 712, 792, 612),))
    ordered = sorted([n3, n2, n1], key=lambda n: n.reading_order)
    assert [n.text for n in ordered] == ["p0-top", "p0-bot", "p1"]


def test_image_tokens_fixed_512():
    from open_parse_spark.core.model import ImageElement

    img = ImageElement(
        text="",
        bbox=Bbox(page=0, page_height=792, page_width=612, x0=0, y0=0, x1=10, y1=10),
        image="aGk=",
        image_mimetype="image/png",
    )
    assert img.tokens == 512
    node = Node(elements=(img,))
    assert node.variant == frozenset({"image"})
    assert node.tokens == 512
