"""Table renderer goldens, ported byte-for-byte from the reference's pytest
suite (``/root/reference/src/tests/tables/pymupdf/test_parse.py:4-78``)."""

from open_parse_spark.functions.tables import (
    clean_headers,
    combine_header_and_table_bboxes,
    output_to_html,
    output_to_markdown,
)


def test_output_to_markdown_standard():
    headers = ["Year", "Revenue", "Expenses"]
    rows = [["2022", "100,000", "50,000"], ["2021", "90,000", "45,000"]]
    expected = (
        "| Year | Revenue | Expenses |\n"
        "|---|---|---|\n"
        "| 2022 | 100,000 | 50,000 |\n"
        "| 2021 | 90,000 | 45,000 |\n"
    )
    assert output_to_markdown(headers, rows) == expected


def test_output_to_markdown_missing_values():
    headers = ["Year", "Revenue", "Expenses"]
    rows = [["2022", "100,000", None], ["2021", "", "45,000"]]
    expected = (
        "| Year | Revenue | Expenses |\n"
        "|---|---|---|\n"
        "| 2022 | 100,000 |   |\n"
        "| 2021 |   | 45,000 |\n"
    )
    assert output_to_markdown(headers, rows) == expected


def test_output_to_markdown_no_data():
    assert output_to_markdown(["Year", "Revenue"], []) == (
        "| Year | Revenue |\n|---|---|\n"
    )


def test_output_to_markdown_newlines_become_spaces():
    out = output_to_markdown(["H"], [["a\nb"]])
    assert out == "| H |\n|---|\n| a b |\n"


def test_output_to_html_standard():
    headers = ["Year", "Revenue", "Expenses"]
    rows = [["2022", "100,000", "50,000"], ["2021", "90,000", "45,000"]]
    expected = (
        '<table border="1">\n'
        "<tr><th>Year</th><th>Revenue</th><th>Expenses</th></tr>\n"
        "<tr><td>2022</td><td>100,000</td><td>50,000</td></tr>\n"
        "<tr><td>2021</td><td>90,000</td><td>45,000</td></tr>\n"
        "</table>"
    )
    assert output_to_html(headers, rows) == expected


def test_output_to_html_missing_values():
    headers = ["Year", "Revenue", "Expenses"]
    rows = [["2022", "100,000", None], ["2021", "", "45,000"]]
    expected = (
        '<table border="1">\n'
        "<tr><th>Year</th><th>Revenue</th><th>Expenses</th></tr>\n"
        "<tr><td>2022</td><td>100,000</td><td> </td></tr>\n"
        "<tr><td>2021</td><td> </td><td>45,000</td></tr>\n"
        "</table>"
    )
    assert output_to_html(headers, rows) == expected


def test_output_to_html_no_data():
    assert output_to_html(["Year", "Revenue"], []) == (
        '<table border="1">\n<tr><th>Year</th><th>Revenue</th></tr>\n</table>'
    )


def test_clean_headers():
    assert clean_headers([None, " Year ", ""]) == ["", "Year", ""]


def test_combine_header_and_table_bboxes():
    assert combine_header_and_table_bboxes((0, 5, 10, 15), (2, 0, 12, 10)) == (
        0,
        0,
        12,
        15,
    )
