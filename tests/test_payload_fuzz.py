"""Property-based fuzzing of the per-turn parse: arbitrary (but
schema-shaped) JSON payloads must never crash, and the output must satisfy
the pipeline's structural invariants — plus full determinism.

Complements the goldens (exact values on pinned inputs) with breadth: the
goldens can't cover the payload space, the invariants can."""

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from open_parse_spark.core.parse import parse_turn_records

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)

_span = st.fixed_dictionaries(
    {
        "text": _text,
        "is_bold": st.booleans(),
        "is_italic": st.booleans(),
        "size": st.floats(min_value=4, max_value=40, allow_nan=False),
    }
)


@st.composite
def _bbox(draw):
    x0 = draw(st.floats(min_value=0, max_value=500, allow_nan=False))
    y0 = draw(st.floats(min_value=0, max_value=700, allow_nan=False))
    w = draw(st.floats(min_value=0.5, max_value=100, allow_nan=False))
    h = draw(st.floats(min_value=0.5, max_value=100, allow_nan=False))
    return [round(x0, 2), round(y0, 2), round(x0 + w, 2), round(y0 + h, 2)]


_line = st.builds(
    lambda bbox, spans: {"bbox": bbox, "spans": spans},
    _bbox(),
    st.lists(_span, min_size=1, max_size=4),
)

_element = st.builds(
    lambda lines: {"kind": "text", "lines": lines},
    st.lists(_line, min_size=1, max_size=5),
)

_page = st.builds(
    lambda page, elements: {
        "page": page,
        "width": 612,
        "height": 792,
        "elements": elements,
    },
    st.integers(min_value=0, max_value=2),
    st.lists(_element, min_size=0, max_size=6),
)

_payload = st.builds(lambda pages: {"pages": pages}, st.lists(_page, max_size=3))


@settings(max_examples=60, deadline=None)
@given(payload=_payload)
def test_fuzzed_payload_invariants(payload):
    text = json.dumps(payload)
    rows = parse_turn_records(text, None)

    # determinism
    assert parse_turn_records(text, None) == rows

    in_pages = {p["page"] for p in payload["pages"]}
    for i, r in enumerate(rows):
        assert r["node_idx"] == i  # contiguous reading-order index
        assert isinstance(r["text"], str)
        assert r["tokens"] >= 0
        assert r["start_page"] <= r["end_page"]
        assert len(r["bbox"]) == r["num_pages"] >= 1
        for b in r["bbox"]:
            assert b["page"] in in_pages
            assert b["x1"] > b["x0"] and b["y1"] > b["y0"]
            assert all(
                math.isfinite(b[k]) for k in ("x0", "y0", "x1", "y1")
            )
        assert len(r["elements"]) >= 1

    # node_idx already IS the reading-order sort position; check the
    # page-level consequence: start_page is monotone unless a merged node
    # spans pages
    pages_seq = [r["start_page"] for r in rows]
    assert pages_seq == sorted(pages_seq) or any(
        r["num_pages"] > 1 for r in rows
    )


@settings(max_examples=30, deadline=None)
@given(
    junk=st.text(max_size=200),
)
def test_fuzzed_junk_never_crashes(junk):
    rows = parse_turn_records(junk, None)
    assert isinstance(rows, list)
    for i, r in enumerate(rows):
        assert r["node_idx"] == i
