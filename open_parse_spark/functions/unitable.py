"""Unitable (B10) pure token/HTML rebuild utilities, torch-free.

The reference's unitable path (``tables/unitable/core.py``) runs three
autoregressive decodes (structure / bbox / cell) over a 448x448 table crop;
the models stay out of scope here (no torch in this environment, and the
reference's own end-to-end test is disabled upstream,
``src/tests/tables/unitable/test_pred_to_schema.py:20-33``).  What IS in
scope — and golden-tested against the reference's 20 recorded model
predictions — is everything downstream of the decode: token-stream cleanup
and the HTML table rebuild.

Ported semantics (cited to the reference):

- ``html_str_to_token_list``  — ``tables/unitable/utils.py:77-97``
- ``cell_str_to_token_list``  — ``tables/unitable/utils.py:100-111``
- ``clean_cell_text``         — decimal re-join, ``tables/unitable/core.py:182``
- ``build_table_from_html_and_cell`` — ``tables/unitable/utils.py:113-133``
- ``bbox_str_to_token_list``  — ``tables/unitable/utils.py:136-157``
- ``html_table_template``     — ``tables/unitable/utils.py:10-23``

Quirks kept bug-compatible:
- ``html_str_to_token_list`` blacklists only ``<eos>``/``<pad>`` (NOT the
  task tokens — the reference comment says "Assuming TASK_TOKENS is defined
  elsewhere" but never strips them, so ``[html]`` survives into the output).
- ``filter_tokens`` drops tokens whose ORIGINAL span is exactly one
  character, even if they are meaningful.
- ``build_table_from_html_and_cell`` silently DROPS trailing fill-cells once
  the content list is exhausted (``continue``), so a short OCR list shortens
  rows — visible in the reference's own recorded ``core_html`` outputs.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

# tables/unitable/tokens.py:2
TASK_TOKENS = ["[table]", "[html]", "[cell]", "[bbox]", "[cell+bbox]"]

_FILL_TAGS = ("<td>[]</td>", ">[]</td>")


def html_table_template(table: str) -> str:
    """tables/unitable/utils.py:10-23 (byte-identical wrapper)."""
    return f"""<html>
        <head> <meta charset="UTF-8">
        <style>
        table, th, td {{
            border: 1px solid black;
            font-size: 10px;
        }}
        </style> </head>
        <body>
        <table frame="hsides" rules="groups" width="100%%">
            {table}
        </table> </body> </html>"""


def filter_tokens(seq: Sequence[Tuple[str, Tuple[int, int]]]) -> List[str]:
    """tables/unitable/utils.py:57-75: drop whitespace-only tokens and
    tokens whose original span is a single character."""
    return [
        token
        for token, span in seq
        if len(token.strip()) > 0 and (span[1] - span[0] != 1)
    ]


def _split_contiguous(seq: str) -> List[Tuple[str, Tuple[int, int]]]:
    """Stand-in for ``tokenizers.pre_tokenizers.Split(" ", "contiguous")``:
    alternating runs of non-space and space characters, with original spans.
    (The tokenizers package may be absent; for space-delimited decode output
    the behaviors agree.)"""
    return [(m.group(0), m.span()) for m in re.finditer(r"[^ ]+| +", seq)]


def html_str_to_token_list(seq: str) -> List[str]:
    """Decoded structure string -> html token list
    (tables/unitable/utils.py:77-97)."""
    seq = seq.split("<eos>")[0]
    for token in ("<eos>", "<pad>"):  # task tokens NOT stripped (ref quirk)
        seq = seq.replace(token, "")
    return filter_tokens(_split_contiguous(seq))


def cell_str_to_token_list(seq: str) -> str:
    """Decoded cell string -> cleaned cell text
    (tables/unitable/utils.py:100-111; returns a string despite the name,
    exactly like the reference)."""
    seq = seq.split("<eos>")[0]
    for tok in ["<eos>", "<pad>", *TASK_TOKENS]:
        seq = seq.replace(tok, "")
    return seq.strip()


def clean_cell_text(text: str) -> str:
    """Decimal re-join applied to every predicted cell
    (tables/unitable/core.py:182): "3. 14" / "3 . 14"-style splits collapse
    to "3.14".  NOTE the reference pattern uses an unescaped ``.`` — any
    single char between digits followed by spaces collapses; kept verbatim."""
    return re.sub(r"(\d).\s+(\d)", r"\1.\2", text)


def build_table_from_html_and_cell(
    structure: List[str], content: Optional[List[str]] = None
) -> List[str]:
    """Fill ``[]`` placeholders in the structure token stream with cell
    contents (tables/unitable/utils.py:113-133).  ``content=None`` fills
    every cell with "placeholder"; an exhausted content list DROPS the
    remaining fill-cells (reference ``continue``)."""
    assert structure is not None
    html_code: List[str] = []
    if content is None:
        content_copy = ["placeholder"] * len(structure)
    else:
        content_copy = content.copy()
    for tag in structure:
        if tag in _FILL_TAGS:
            if len(content_copy) == 0:
                continue
            cell = content_copy.pop(0)
            html_code.append(tag.replace("[]", cell))
        else:
            html_code.append(tag)
    return html_code


def bbox_str_to_token_list(seq: str) -> List[Tuple[int, int, int, int]]:
    """Decoded bbox string ("bbox-12 bbox-34 ..." tokens) -> list of 4-int
    boxes, truncated to a multiple of 4 (tables/unitable/utils.py:136-157)."""
    seq = seq.split("<eos>")[0]
    for tok in ["<eos>", "<pad>", *TASK_TOKENS]:
        seq = seq.replace(tok, "")
    int_seq = [int(piece.split("-")[1]) for piece in seq.split(" ") if piece]
    rounded_seq_len = len(int_seq) // 4 * 4
    return [tuple(int_seq[i : i + 4]) for i in range(0, rounded_seq_len, 4)]


def rebuild_table_html(
    structure: List[str], cells: Optional[List[str]] = None
) -> str:
    """Full downstream-of-decode path (tables/unitable/core.py:196-200):
    clean each cell, fill the structure, join, wrap in the page template."""
    if cells is not None:
        cells = [clean_cell_text(c) for c in cells]
    return html_table_template("".join(build_table_from_html_and_cell(structure, cells)))
