"""Char->span grouping goldens, ported from the reference's own pytest suite
(``/root/reference/src/tests/text/pdf_miner/test_core.py:18-205``)."""

from open_parse_spark.core.spans import (
    CharElement,
    extract_chars,
    group_chars_into_spans,
)


def test_group_chars_into_spans_parties():
    raw_chars = [CharElement(text=c, fontname="bold", size=9.0) for c in "1. PARTIES:"]
    raw_chars += [
        CharElement(text=" ", fontname="", size=9.0),
        CharElement(text=" ", fontname="", size=9.0),
    ]
    result = group_chars_into_spans(raw_chars)
    assert len(result) == 1
    assert result[0].text == "1. PARTIES: "
    assert result[0].is_bold is True
    assert result[0].is_italic is False
    assert result[0].size == 9.0


def test_group_chars_into_spans_mixed_styles():
    mixed_chars = [
        CharElement(text="H", fontname="bold", size=9.0),
        CharElement(text="e", fontname="italic", size=9.0),
        CharElement(text="l", fontname="bold", size=9.0),
        CharElement(text="l", fontname="bold", size=9.0),
        CharElement(text="o", fontname="", size=9.0),
        CharElement(text=" ", fontname="", size=9.0),
        CharElement(text="W", fontname="boldItalic", size=9.0),
        CharElement(text="o", fontname="boldItalic", size=9.0),
        CharElement(text="r", fontname="boldItalic", size=9.0),
        CharElement(text="l", fontname="boldItalic", size=9.0),
        CharElement(text="d", fontname="boldItalic", size=9.0),
    ]
    expected = [
        ("H", True, False),
        ("e", False, True),
        ("ll", True, False),
        ("o ", False, False),
        ("World", True, True),
    ]
    result = group_chars_into_spans(mixed_chars)
    assert [(s.text, s.is_bold, s.is_italic) for s in result] == expected
    assert all(s.size == 9.0 for s in result)


def test_extract_chars_plain():
    char_data = [(c, "Arial-Bold", 12.0) for c in "About who"]
    result = extract_chars(char_data)
    assert len(result) == 9
    assert all(c.fontname == "Arial-Bold" and c.size == 12.0 for c in result)
    assert "".join(c.text for c in result) == "About who"


def test_extract_chars_with_ltannos():
    """LTAnno whitespace inherits the previous real char's font
    (reference text/pdfminer/core.py:43-67)."""
    char_data = (
        [(c, "Arial-Bold", 12.0) for c in "About"]
        + [(" ", "", 0.0)]
        + [(c, "Arial-Bold", 12.0) for c in "who"]
        + [(" ", "", 0.0), (" ", "", 0.0)]
        + [(c, "Arial-Bold", 12.0) for c in "Author"]
        + [("\n", "", 0.0)]
    )
    result = extract_chars(char_data)
    assert len(result) == 18
    assert all(c.fontname == "Arial-Bold" for c in result)
    assert all(c.size == 12.0 for c in result)


def test_extract_chars_leading_anno_inherits_first_real_font():
    char_data = [(" ", "", 0.0), ("A", "Arial-Bold", 12.0)]
    result = extract_chars(char_data)
    assert result[0].fontname == "Arial-Bold"
    assert result[0].size == 12.0


def test_char_size_rounded_2dp():
    """Reference text/pdfminer/core.py:36-40."""
    assert CharElement(text="a", fontname="x", size=9.0051).size == 9.01
