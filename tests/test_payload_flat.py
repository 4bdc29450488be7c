"""Differential test: the flat (object-free) layout decode equals the
eager LineElement/TextSpan construction on randomized span payloads.

``_flat_decode_text_lines`` computes element text / bbox fold / style folds
straight off the span dicts (the parse hot path); this replays every element
through the object path (``_decode_line`` + ``get_lines_bbox``) and asserts
value equality, including the lazily rebuilt ``.lines``.  The randomizer
deliberately emits non-bool style flags, numeric-string sizes, missing
``spans`` keys, empty span dicts and markdown metacharacters.
"""

import random

from open_parse_spark.core import payload as P


def _rand_span(rng):
    if rng.random() >= 0.9:
        return {}
    return {
        "text": "".join(rng.choice("ab *_c**d DE1 ") for _ in range(rng.randrange(0, 12))),
        "is_bold": rng.choice([True, False, 1, 0, None]),
        "is_italic": rng.choice([True, False]),
        "size": rng.choice([8.0, 11.0, 16, 16.0, 18.5, "11.5"]),
    }


def _rand_line(rng):
    d = {
        "bbox": [round(rng.uniform(0, 600), rng.randrange(0, 5)) for _ in range(2)]
        + [round(rng.uniform(600, 800), 3), round(rng.uniform(600, 800), 3)],
        "spans": [_rand_span(rng) for _ in range(rng.randrange(0, 5))],
    }
    if rng.random() < 0.1:
        d.pop("spans")
    return d


def test_flat_decode_equals_object_decode():
    rng = random.Random(20260817)
    for _ in range(1500):
        el = {"kind": "text", "lines": [_rand_line(rng) for _ in range(rng.randrange(1, 6))]}
        if rng.random() < 0.4:
            el["bbox"] = [1.0, 2.0, 300.0, 400.0]
        page_obj = {"page": 0, "width": 612.0, "height": 792.0, "elements": [el]}

        flat = P._decode_page_elements(page_obj)[0]
        assert isinstance(flat, P.LazyLinesTextElement)

        lines = [P._decode_line(line) for line in el["lines"]]
        if "bbox" in el:
            x0, y0, x1, y1 = el["bbox"]
        else:
            x0, y0, x1, y1 = P.get_lines_bbox(lines)

        assert flat.text == "\n".join(line.text for line in lines)
        assert flat.is_heading == all(line.is_heading for line in lines)
        assert flat.is_bold == all(line.is_bold for line in lines)
        assert (flat.bbox.x0, flat.bbox.y0, flat.bbox.x1, flat.bbox.y1) == (
            float(x0), float(y0), float(x1), float(y1),
        )
        lazy = flat.lines
        assert len(lazy) == len(lines)
        for a, b in zip(lazy, lines):
            assert a.bbox == b.bbox and a.spans == b.spans and a.text == b.text


def test_chars_grammar_falls_back_to_object_path():
    page_obj = {
        "page": 0,
        "elements": [
            {
                "kind": "text",
                "lines": [
                    {
                        "bbox": [0.0, 0.0, 10.0, 10.0],
                        "chars": [
                            {"text": "H", "fontname": "Bold", "size": 11.0},
                            {"text": "i", "fontname": "Bold", "size": 11.0},
                        ],
                    }
                ],
            }
        ],
    }
    (element,) = P._decode_page_elements(page_obj)
    assert not isinstance(element, P.LazyLinesTextElement)
    assert element.text
