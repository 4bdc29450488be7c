"""Span->markdown assembly goldens, ported byte-for-byte from the reference's
own pytest suite (``/root/reference/src/tests/test_schemas.py:61-268``)."""

from open_parse_spark.core.model import LineElement, TextSpan


def span(text, bold=False, italic=False, size=12.0):
    return TextSpan(text=text, is_bold=bold, is_italic=italic, size=size)


def test_formatted_text_no_adjacent():
    assert span("Bold Text", bold=True).formatted_text() == "**Bold Text**"
    assert span("Italic Text", italic=True).formatted_text() == "*Italic Text*"
    assert span("Regular Text").formatted_text() == "Regular Text"


def test_formatted_text_with_same_style_adjacent():
    bold = span("Bold Text", bold=True)
    nxt = span(" Next", bold=True)
    out = bold.formatted_text(next_span=nxt)
    assert out.startswith("**") and not out.endswith("**")


def test_formatted_text_with_different_style_adjacent():
    out = span("Bold Text", bold=True).formatted_text(next_span=span("Regular Text"))
    assert out.endswith("**")


def test_formatted_text_edge_cases():
    assert span("").formatted_text() == ""
    assert span("No Style").formatted_text() == "No Style"


def test_mixed_bold_and_italic_within_same_span():
    assert (
        span("Bold and Italic", bold=True, italic=True).formatted_text()
        == "***Bold and Italic***"
    )


def test_adjacent_spans_with_opposite_styles():
    bold = span("Bold Text", bold=True)
    italic = span("Italic Text", italic=True)
    assert bold.formatted_text(next_span=italic).endswith("**")
    assert italic.formatted_text(previous_span=bold).startswith("*")


def test_lease_case_1_mixed_bold():
    """Reference test_schemas.py:130-146."""
    spans = [
        span("T", bold=True, size=14.0),
        span("ENNYSON ", bold=True, size=11.0),
        span("P", bold=True, size=14.0),
        span("LACE ", bold=True, size=11.0),
        span("L", bold=True, size=14.0),
        span("EASE ", bold=True, size=11.0),
        span("A", bold=True, size=14.0),
        span("GREEMENT", bold=True, size=11.0),
        span(" ", bold=True, size=25.0),
    ]
    line = LineElement(bbox=(0, 0, 0, 0), spans=spans)
    assert line.text == "**TENNYSON PLACE LEASE AGREEMENT**"


def test_lease_case_2_start_bold_end_regular():
    """Reference test_schemas.py:148-160."""
    spans = [
        span("1.", bold=True, size=9.0),
        span(" ", size=9.0),
        span("PARTIES:", bold=True, size=9.0),
        span("  ", size=9.0),
    ]
    line = LineElement(bbox=(0, 0, 0, 0), spans=spans)
    assert line.text == "**1.** **PARTIES:**"


def test_lease_case_3_complex():
    """Reference test_schemas.py:162-205."""
    spans = [
        span(
            "THIS RENTAL LEASE AGREEMENT (hereinafter “Lease” or “Agreement”) dated ",
            size=9.0,
        ),
        span("1/12/2003 12:36:16 PM", bold=True, size=9.0),
        span(" between Hacker Apartment ", size=9.0),
        span(
            'Services, Inc. as Owner or as agent for the Owner (hereinafter "Agent") ',
            size=9.0,
        ),
        span("Lebron James", bold=True, size=9.0),
        span(' (collectively hereinafter "Resident").  ', size=9.0),
        span(
            "Resident along with the following persons, shall be authorized occupants.",
            size=9.0,
        ),
    ]
    expected = (
        "THIS RENTAL LEASE AGREEMENT (hereinafter “Lease” or “Agreement”) dated**1/12/2003 12:36:16 PM**"
        'between Hacker Apartment Services, Inc. as Owner or as agent for the Owner (hereinafter "Agent")'
        '**Lebron James**(collectively hereinafter "Resident").  '
        "Resident along with the following persons, shall be authorized occupants."
    )
    line = LineElement(bbox=(0, 0, 0, 0), spans=spans)
    assert line.text == expected.strip()


def test_lease_case_4_legal_paragraph():
    """Reference test_schemas.py:207-268."""
    spans = [
        span(
            "In any disputed court action where the court resolves the dispute and determines the prevailing party, the court shall also award to the ",
            size=9.0,
        ),
        span(
            "prevailing party its attorneys’ fees and costs and the non-prevailing party shall be liable to the prevailing party for payment of any court ",
            size=9.0,
        ),
        span(
            "awarded attorneys’ fees and costs. Resident agrees to pay eighteen percent (18%) interest compounded annually on all unpaid rent, amounts, ",
            size=9.0,
        ),
        span(
            "or damages owed by Resident, except for late fees, from that date of Landlord’s final accounting until such time Resident pays all outstanding ",
            size=9.0,
        ),
        span("amounts.  ", size=9.0),
        span(
            "Agent and Resident agree that any action or proceeding arising out of or in any way connected with this Agreement, ",
            bold=True,
            size=9.0,
        ),
        span(
            "regardless of whether such claim is based on contract, tort, or other legal theory, shall be heard by a court sitting without a jury and ",
            bold=True,
            size=9.0,
        ),
        span(
            "thus Resident hereby waives all rights to a trial by jury",
            bold=True,
            size=9.0,
        ),
        span(". ", bold=True, size=9.0),
    ]
    expected = (
        "In any disputed court action where the court resolves the dispute and determines the prevailing party, the court shall also award to the "
        "prevailing party its attorneys’ fees and costs and the non-prevailing party shall be liable to the prevailing party for payment of any court "
        "awarded attorneys’ fees and costs. Resident agrees to pay eighteen percent (18%) interest compounded annually on all unpaid rent, amounts, "
        "or damages owed by Resident, except for late fees, from that date of Landlord’s final accounting until such time Resident pays all outstanding "
        "amounts.**Agent and Resident agree that any action or proceeding arising out of or in any way connected with this Agreement, "
        "regardless of whether such claim is based on contract, tort, or other legal theory, shall be heard by a court sitting without a jury and "
        "thus Resident hereby waives all rights to a trial by jury.**"
    )
    line = LineElement(bbox=(0, 0, 0, 0), spans=spans)
    assert line.text.strip() == expected.strip()


def test_line_bbox_rounded_to_2dp():
    """Reference schemas.py:116-119."""
    line = LineElement(bbox=(0.123456, 1.995, 10.004, 20.129), spans=())
    assert line.bbox == (0.12, 2.0, 10.0, 20.13)


# ---------------------------------------------------------------------------
# K4: render_markdown == reference Node._repr_markdown_ (schemas.py:650-667)
# ---------------------------------------------------------------------------


def test_render_markdown_text_and_table_join():
    from open_parse_spark.plans.exports import render_markdown

    out = render_markdown(
        variants=["text", "table"],
        texts=["**Heading**<br>body", "<table border=\"1\">...</table>"],
        images=["", ""],
    )
    # text and table elements render their text, joined by blank lines
    assert out == "**Heading**<br>body\n\n<table border=\"1\">...</table>"


def test_render_markdown_image_data_uri_and_mime_fallback():
    from open_parse_spark.plans.exports import render_markdown

    # explicit mimetype is used; reference maps "unknown" -> image/png
    out = render_markdown(
        variants=["image", "image", "text"],
        texts=["", "", "tail"],
        images=["QUJD", "RUZH", ""],
        image_mimes=["image/jpeg", "unknown", "unknown"],
    )
    assert out.split("\n\n") == [
        "![Image](data:image/jpeg;base64,QUJD)",
        "![Image](data:image/png;base64,RUZH)",
        "tail",
    ]
    # mimes omitted entirely -> every image falls back to png
    out2 = render_markdown(["image"], [""], ["QUJD"])
    assert out2 == "![Image](data:image/png;base64,QUJD)"


def test_render_markdown_empty_node():
    from open_parse_spark.plans.exports import render_markdown

    assert render_markdown([], [], []) == ""
