"""Deterministic synthetic transcripts generator.

Produces the input table mandated by BASELINE.json `input_hint`:
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)`` — seeded, fully deterministic (same seed -> byte-identical
table), with the fixture families of FIXTURES.md §3 plus skewed prose
(log-normal payload sizes; a few conv_ids holding a large share of bytes)
to exercise the salted, skew-aware repartitioning.

No wall-clock anywhere: timestamps are ``epoch + f(conv, turn)``.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd

_ROLES = ["user", "assistant", "tool"]

_WORDS = (
    "the quick brown fox jumps over lazy dog agreement tenant landlord "
    "clause obligation payment notice term renewal deposit premises "
    "maintenance repair utility insurance liability damage inspection "
    "termination default remedy waiver severability assignment sublease "
    "guarantor occupancy pet parking storage amenity schedule exhibit"
).split()


def _line(
    y: float,
    text: str,
    bold: bool = False,
    italic: bool = False,
    size: float = 11.0,
    x0: float = 72.0,
    x1: float = 540.0,
) -> Dict[str, Any]:
    return {
        "bbox": [x0, y - 12.0, x1, y],
        "spans": [
            {"text": text, "is_bold": bold, "is_italic": italic, "size": size}
        ],
    }


def _page(elements: List[dict], page: int = 0, w: float = 612.0, h: float = 792.0):
    return {"page": page, "width": w, "height": h, "elements": elements}


def _payload(pages: List[dict]) -> str:
    return json.dumps({"pages": pages}, separators=(",", ":"))


def _prose(rng: np.random.RandomState, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS, size=max(1, n_words)))


def _lease_turn(rng: np.random.RandomState) -> str:
    """F6: heading + long body paragraphs + footer stub."""
    body1 = [
        _line(640 - i * 14, _prose(rng, 14) + ",") for i in range(rng.randint(5, 9))
    ]
    body2 = [
        _line(480 - i * 14, _prose(rng, 14) + ".") for i in range(rng.randint(5, 9))
    ]
    elements = [
        {"kind": "text", "lines": [_line(700, "MOCK LEASE AGREEMENT", bold=True, size=18.0)]},
        {"kind": "text", "lines": body1},
        {"kind": "text", "lines": body2},
        {"kind": "text", "lines": [_line(20, f"Page {rng.randint(1, 9)} of 9")]},
    ]
    return _payload([_page(elements)])


def _span_golden_turn(rng: np.random.RandomState) -> str:
    """F1: style-transition span sequences."""
    variants = [
        [
            {"text": "T", "is_bold": True, "is_italic": False, "size": 14.0},
            {"text": "ENNYSON ", "is_bold": True, "is_italic": False, "size": 11.0},
            {"text": "P", "is_bold": True, "is_italic": False, "size": 14.0},
            {"text": "LACE", "is_bold": True, "is_italic": False, "size": 11.0},
        ],
        [
            {"text": "1.", "is_bold": True, "is_italic": False, "size": 9.0},
            {"text": " ", "is_bold": False, "is_italic": False, "size": 9.0},
            {"text": "PARTIES:", "is_bold": True, "is_italic": False, "size": 9.0},
        ],
        [
            {"text": "dated ", "is_bold": False, "is_italic": False, "size": 9.0},
            {"text": "1/12/2003", "is_bold": True, "is_italic": False, "size": 9.0},
            {"text": " between ", "is_bold": False, "is_italic": True, "size": 9.0},
        ],
    ]
    spans = variants[rng.randint(len(variants))]
    body = [_line(600 - i * 14, _prose(rng, 13)) for i in range(7)]
    elements = [
        {
            "kind": "text",
            "lines": [{"bbox": [72.0, 688.0, 540.0, 700.0], "spans": spans}],
        },
        {"kind": "text", "lines": body},
    ]
    return _payload([_page(elements)])


def _bullet_turn(rng: np.random.RandomState) -> str:
    """F3: bullet runs split across nodes to exercise CombineBullets."""
    markers = ["- ", "• ", "* ", "1. ", "(a) ", "A. "]
    elements = []
    y = 700.0
    for _ in range(rng.randint(3, 6)):
        m = markers[rng.randint(len(markers))]
        elements.append(
            {"kind": "text", "lines": [_line(y, m + _prose(rng, 8))]}
        )
        y -= 40.0
    elements.append(
        {"kind": "text", "lines": [_line(y, _prose(rng, 60))]}
    )
    return _payload([_page(elements)])


def _table_turn(rng: np.random.RandomState) -> tuple:
    """F5: table grid in the tool column + context text in the text column."""
    n_rows = rng.randint(2, 6)
    headers = ["Year", "Revenue", "Expenses"][: rng.randint(2, 4)]
    rows = []
    for r in range(n_rows):
        row: List[Optional[str]] = [str(2020 + r)]
        for _ in range(len(headers) - 1):
            pick = rng.randint(10)
            row.append(
                None if pick == 0 else "" if pick == 1 else f"{rng.randint(1000):,}"
            )
        rows.append(row)
    fmt = "html" if rng.randint(2) else "markdown"
    text_payload = _payload(
        [
            _page(
                [
                    {"kind": "text", "lines": [_line(700, _prose(rng, 40))]},
                    {
                        "kind": "text",
                        "lines": [_line(430, _prose(rng, 6))],
                    },  # inside the table box -> removed by P1
                ]
            )
        ]
    )
    tool_payload = _payload(
        [
            _page(
                [
                    {
                        "kind": "table",
                        "headers": headers,
                        "rows": rows,
                        "bbox": [72.0, 300.0, 540.0, 500.0],
                        "output_format": fmt,
                    }
                ]
            )
        ]
    )
    return text_payload, tool_payload


def _image_turn(rng: np.random.RandomState) -> str:
    """Image slices + caption text on one page (exercises P2
    CombineSlicedImages distributed)."""
    import base64

    n_slices = rng.randint(2, 4)
    elements = []
    y = 600.0
    for s in range(n_slices):
        payload = base64.b64encode(
            bytes(rng.randint(0, 256, size=64, dtype=np.uint8))
        ).decode()
        elements.append(
            {
                "kind": "image",
                "bbox": [100.0, y - 80.0, 400.0, y],
                "image": payload,
                "image_mimetype": "image/png",
            }
        )
        y -= 80.0
    elements.append(
        {"kind": "text", "lines": [_line(y - 20.0, _prose(rng, 30))]}
    )
    return _payload([_page(elements)])


def _multipage_turn(rng: np.random.RandomState) -> str:
    """F7: elements across two pages; reading order + per-page bbox union."""
    pages = []
    for p in range(2):
        elements = [
            {
                "kind": "text",
                "lines": [
                    _line(700 - i * 14, _prose(rng, 12)) for i in range(6)
                ],
            },
            {
                "kind": "text",
                "lines": [
                    _line(560 - i * 14, _prose(rng, 12)) for i in range(6)
                ],
            },
        ]
        pages.append(_page(elements, page=p))
    return _payload(pages)


def _prose_turn(rng: np.random.RandomState, scale: float) -> str:
    """Plain prose with log-normal length (payload-size skew driver)."""
    n_words = int(min(20000, max(10, rng.lognormal(4.0, 1.2) * scale)))
    paras = []
    remaining = n_words
    while remaining > 0:
        k = int(min(remaining, max(10, rng.lognormal(3.5, 0.6))))
        paras.append(_prose(rng, k))
        remaining -= k
    return "\n\n".join(paras)


def gen_transcripts(
    n_convs: int = 50,
    avg_turns: int = 10,
    seed: int = 42,
    skew_top_pct: float = 0.02,
    skew_scale: float = 20.0,
) -> pd.DataFrame:
    """Deterministic transcripts table (FIXTURES.md §1).

    The top ``skew_top_pct`` of conversations get ``skew_scale``x payload
    sizes — the skew the repartitioner must handle.
    """
    rows = []
    for c in range(n_convs):
        conv_id = f"conv-{c:06d}"
        conv_rng = np.random.RandomState(seed * 1_000_003 + c)
        n_turns = max(1, int(conv_rng.poisson(avg_turns)))
        is_heavy = conv_rng.rand() < skew_top_pct
        scale = skew_scale if is_heavy else 1.0
        for t in range(n_turns):
            role = _ROLES[t % 3]
            kind = conv_rng.randint(10)
            tool = ""
            if kind == 0:
                text = _lease_turn(conv_rng)
            elif kind == 1:
                text = _span_golden_turn(conv_rng)
            elif kind == 2:
                text = _bullet_turn(conv_rng)
            elif kind == 3:
                text, tool = _table_turn(conv_rng)
            elif kind == 4:
                text = _multipage_turn(conv_rng)
            elif kind == 5:
                text = _image_turn(conv_rng)
            else:
                text = _prose_turn(conv_rng, scale)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": np.int32(t),
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": pd.Timestamp("2020-01-01")
                    + pd.Timedelta(seconds=int(c) * 1000 + int(t)),
                }
            )
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def write_transcripts_parquet(
    path: str, n_files: int = 1, row_group_size: int = 2048, **kwargs
) -> pd.DataFrame:
    """Write the synthetic transcripts as parquet.

    ``n_files > 1`` writes a directory of that many part files (rows dealt
    round-robin so every file carries the same conv-size mix).  A single
    file caps the zero-shuffle parse at its row-group count — ~1.5 task
    waves at 32 cores for the 41 MB bench corpus — which makes wide-
    parallelism walls straggler-ragged; real corpora are thousands of
    files, so the bench input should be too (see PLANS.md bench-scale
    caveat)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    df = gen_transcripts(**kwargs)
    # Spark cannot read TIMESTAMP(NANOS); coerce to microseconds.
    # Small row groups -> many input splits -> parallel scan (a single giant
    # row group would serialize the whole first stage).
    write_opts = dict(
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
        row_group_size=row_group_size,
    )
    if n_files <= 1:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path, **write_opts)
        return df
    # regenerating into an existing dir with a smaller n_files must not
    # leave stale part files mixing old data into the corpus (review)
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    for i in range(n_files):
        part = df.iloc[i::n_files]
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            os.path.join(path, f"part-{i:05d}.parquet"),
            **write_opts,
        )
    return df
