"""Per-turn parse — the single-threaded reference-semantics entry point.

``parse_turn(text, tool)`` is the exact function applied to every turn, both
by the oracle (tests/golden generation) and inside the Spark ``mapInPandas``
batch UDF (``open_parse_spark/spark/pipeline.py``).  One code path -> the
distributed output equals the single-threaded output by construction; the
code path itself is pinned to the reference by the ported goldens in
``tests/``.

Mirrors ``DocumentParser.parse`` (``/root/reference/src/openparse/doc_parser.py:83-126``):
extract elements -> wrap one node per element -> run the processing pipeline.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from open_parse_spark.core.model import Node
from open_parse_spark.core.payload import decode_payload, elements_to_nodes
from open_parse_spark.core.transforms import (
    Transform,
    basic_pipeline_transforms,
    run_pipeline,
)

# Built once per process: every transform closure is stateless (all mutable
# structures live inside each ``process(...)`` invocation), so the default
# pipeline is safely shared across turns instead of re-creating 12 closures
# per parse_turn call.
_DEFAULT_TRANSFORMS: List[Transform] = basic_pipeline_transforms()


def parse_turn(
    text: Optional[str],
    tool: Optional[str] = None,
    transforms: Optional[List[Transform]] = None,
) -> List[Node]:
    """Parse one turn payload into reading-ordered content nodes."""
    elements = decode_payload(text, tool)
    nodes = elements_to_nodes(elements)
    if transforms is None:
        transforms = _DEFAULT_TRANSFORMS
    return run_pipeline(nodes, transforms)


def node_to_record(node: Node, node_idx: int) -> Dict[str, Any]:
    """Flatten a node into the stable output row shape (no uuids/dates —
    SURVEY §4.3.5)."""
    return {
        "node_idx": node_idx,
        "text": node.text,
        "tokens": node.tokens,
        "variant": sorted(node.variant),
        "num_pages": node.num_pages,
        "start_page": node.start_page,
        "end_page": node.end_page,
        "bbox": [
            {
                "page": b.page,
                "page_height": b.page_height,
                "page_width": b.page_width,
                "x0": b.x0,
                "y0": b.y0,
                "x1": b.x1,
                "y1": b.y1,
            }
            for b in node.bbox
        ],
        "elements": [
            {
                "variant": e.variant,
                "text": e.text,
                "bbox": {
                    "page": e.bbox.page,
                    "page_height": e.bbox.page_height,
                    "page_width": e.bbox.page_width,
                    "x0": e.bbox.x0,
                    "y0": e.bbox.y0,
                    "x1": e.bbox.x1,
                    "y1": e.bbox.y1,
                },
                "image_mimetype": getattr(e, "image_mimetype", None),
            }
            for e in node.elements
        ],
    }


def parse_turn_records(
    text: Optional[str], tool: Optional[str] = None
) -> List[Dict[str, Any]]:
    """parse_turn + flatten; node_idx is the final reading-order position."""
    return [
        node_to_record(node, i) for i, node in enumerate(parse_turn(text, tool))
    ]
