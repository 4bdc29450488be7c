"""End-to-end document fixtures (FIXTURES.md F6/F7), the port of the
reference's e2e expectations (``src/tests/test_doc_parser.py:6-61``):
- the lease-like doc's first node starts with the bold-merged heading
- the table turn yields a node starting ``<table``
plus property-based invariants (hypothesis) the reference never had."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from open_parse_spark.core.parse import parse_turn, parse_turn_records


def line(y, text, bold=False, italic=False, size=11.0, x0=72.0, x1=540.0):
    return {
        "bbox": [x0, y - 12.0, x1, y],
        "spans": [{"text": text, "is_bold": bold, "is_italic": italic, "size": size}],
    }


def lease_payload():
    body1 = [line(640 - i * 14, f"clause {i} with plenty of long prose text for the body, " * 2) for i in range(8)]
    body2 = [line(480 - i * 14, f"obligations paragraph {i} with more long prose text here, " * 2) for i in range(8)]
    return json.dumps(
        {
            "pages": [
                {
                    "page": 0,
                    "width": 612.0,
                    "height": 792.0,
                    "elements": [
                        {"kind": "text", "lines": [line(700, "MOCK LEASE AGREEMENT", bold=True, size=18.0)]},
                        {"kind": "text", "lines": body1},
                        {"kind": "text", "lines": body2},
                        {"kind": "text", "lines": [line(20, "Page 1 of 9")]},
                    ],
                }
            ]
        }
    )


def test_first_node_starts_with_bold_heading():
    """Port of test_doc_parser.py:6-11."""
    nodes = parse_turn(lease_payload())
    assert nodes, "expected at least one node"
    assert nodes[0].text.startswith("**MOCK LEASE AGREEMENT**")


def test_footer_removed():
    nodes = parse_turn(lease_payload())
    assert all("Page 1 of 9" not in n.text for n in nodes)


def test_table_node_starts_with_table_tag():
    """Port of test_doc_parser.py:44-52 (pymupdf table node starts <table)."""
    tool = json.dumps(
        {
            "pages": [
                {
                    "page": 0,
                    "width": 612.0,
                    "height": 792.0,
                    "elements": [
                        {
                            "kind": "table",
                            "headers": ["GROUP NAME", "CO NO"],
                            "rows": [["Alpha", "1"], ["Beta", "2"]],
                            "bbox": [72, 300, 540, 500],
                            "output_format": "html",
                        }
                    ],
                }
            ]
        }
    )
    nodes = parse_turn(lease_payload(), tool)
    table_nodes = [n for n in nodes if "table" in n.variant]
    assert table_nodes and table_nodes[-1].text.startswith("<table")
    assert "GROUP NAME" in table_nodes[-1].text


def test_multipage_reading_order():
    """F7: page-0 nodes strictly precede page-1 nodes in output order."""
    pages = []
    for p in range(2):
        pages.append(
            {
                "page": p,
                "width": 612.0,
                "height": 792.0,
                "elements": [
                    {
                        "kind": "text",
                        "lines": [
                            line(700 - i * 14, f"page {p} para A sentence {i} " * 4)
                            for i in range(6)
                        ],
                    },
                    {
                        "kind": "text",
                        "lines": [
                            line(560 - i * 14, f"page {p} para B sentence {i} " * 4)
                            for i in range(6)
                        ],
                    },
                ],
            }
        )
    nodes = parse_turn(json.dumps({"pages": pages}))
    pages_seq = [n.start_page for n in nodes]
    assert pages_seq == sorted(pages_seq)


# --- property-based invariants ---

words = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8),
    min_size=1,
    max_size=60,
)


@settings(max_examples=40, deadline=None)
@given(paras=st.lists(words, min_size=1, max_size=6), data=st.data())
def test_prose_parse_invariants(paras, data):
    text = "\n\n".join(" ".join(p) for p in paras)
    recs = parse_turn_records(text)
    # determinism
    assert recs == parse_turn_records(text)
    # node_idx is dense and ordered
    assert [r["node_idx"] for r in recs] == list(range(len(recs)))
    for r in recs:
        assert r["tokens"] > 0
        assert r["text"]
        assert r["start_page"] <= r["end_page"]
        assert r["num_pages"] >= 1
        assert len(r["bbox"]) == r["num_pages"]
    # every surviving node passes the stub filter (no image nodes in prose)
    assert all(r["tokens"] > 50 for r in recs)


@settings(max_examples=25, deadline=None)
@given(
    spans=st.lists(
        st.tuples(
            st.text(alphabet="abc *_", min_size=0, max_size=12),
            st.booleans(),
            st.booleans(),
            st.floats(min_value=6, max_value=30, allow_nan=False),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_line_text_never_crashes_and_is_deterministic(spans):
    from open_parse_spark.core.model import LineElement, TextSpan

    line_el = LineElement(
        bbox=(0, 0, 100, 12),
        spans=tuple(
            TextSpan(text=t, is_bold=b, is_italic=i, size=s) for t, b, i, s in spans
        ),
    )
    assert line_el.text == LineElement(bbox=(0, 0, 100, 12), spans=line_el.spans).text


@settings(max_examples=25, deadline=None)
@given(
    raw=st.lists(
        st.tuples(
            # single characters, as pdfminer emits (LTChar/LTAnno)
            st.text(alphabet="ab c", min_size=1, max_size=1),
            st.sampled_from(["bold", "italic", "Plain", ""]),
            st.floats(min_value=6, max_value=20, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_char_grouping_roundtrip_properties(raw):
    from open_parse_spark.core.spans import extract_chars, group_chars_into_spans

    chars = extract_chars([(t, f, s) for t, f, s in raw])
    spans = group_chars_into_spans(chars)
    # span text contains no double spaces (whitespace compression invariant)
    for sp in spans:
        assert "  " not in sp.text
    # concatenated span text preserves non-space characters in order
    orig = "".join(t for t, _, _ in raw if not t.isspace())
    got = "".join(sp.text.replace(" ", "") for sp in spans)
    assert got == orig.replace(" ", "")
