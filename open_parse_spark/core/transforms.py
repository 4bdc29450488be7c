"""Node pipeline transforms P1..P10 — exact reference semantics.

Reference: ``/root/reference/src/openparse/processing/basic_transforms.py``
and pipeline order/constants ``processing/ingest.py:70-92``.

All transforms are pure functions ``list[Node] -> list[Node]`` run
sequentially per turn (SURVEY §2.4): the reference pipeline is greedy and
order-dependent (P4/P5/P6), so per-turn sequential execution is required for
equality; parallelism is across turns via Spark.

Bug-compatible behaviors preserved deliberately (SURVEY §4.3.7-8):
- RemoveMetadataElements silently drops multi-page nodes
  (basic_transforms.py:221-223).
- CombineSlicedImages merges ALL images on a page with that page's text and
  duplicates multi-page nodes across page buckets (basic_transforms.py:101-119).
"""

from __future__ import annotations

import base64
from typing import Callable, Dict, List

from open_parse_spark.core.model import (
    Bbox,
    ImageElement,
    Node,
    TextElement,
)

Transform = Callable[[List[Node]], List[Node]]


from operator import attrgetter

_reading_order = attrgetter("reading_order")


def _sorted_nodes(nodes: List[Node]) -> List[Node]:
    """Stable reading-order sort (ingest.py:37-44 uses Python's stable sort).
    attrgetter key: this runs before every pipeline step on every turn."""
    return sorted(nodes, key=_reading_order)


# ---------------------------------------------------------------------------
# P1 RemoveTextInsideTables — basic_transforms.py:122-171
# ---------------------------------------------------------------------------


def _intersects_strict(text_bbox: Bbox, table_bbox: Bbox) -> bool:
    """Strict inequality intersection (basic_transforms.py:164-171)."""
    return (
        text_bbox.x1 > table_bbox.x0
        and text_bbox.x0 < table_bbox.x1
        and text_bbox.y1 > table_bbox.y0
        and text_bbox.y0 < table_bbox.y1
    )


def remove_text_inside_tables(nodes: List[Node]) -> List[Node]:
    tables_by_page: Dict[int, List[Bbox]] = {}
    for node in nodes:
        if node.variant == frozenset({"table"}):
            for table_element in node.elements:
                tables_by_page.setdefault(table_element.page, []).append(
                    table_element.bbox
                )

    if not tables_by_page:
        # no tables in the turn (the common case): nothing can be removed —
        # identical to running the loop below, which would keep every node
        return list(nodes)

    updated_nodes: List[Node] = []
    for node in nodes:
        if node.variant == frozenset({"table"}):
            updated_nodes.append(node)
            continue
        new_elements = []
        for element in node.elements:
            should_include = not (
                isinstance(element, TextElement)
                and any(
                    _intersects_strict(element.bbox, tb)
                    for tb in tables_by_page.get(element.page, [])
                )
            )
            if should_include:
                new_elements.append(element)
        if new_elements and len(new_elements) != len(node.elements):
            updated_nodes.append(Node(elements=tuple(new_elements)))
        elif len(new_elements) == len(node.elements):
            updated_nodes.append(node)
    return updated_nodes


# ---------------------------------------------------------------------------
# P2 CombineSlicedImages — basic_transforms.py:32-119
# ---------------------------------------------------------------------------


def _combine_images_in_group(image_elements: List[ImageElement]) -> ImageElement:
    """Deterministic stand-in for the reference's PIL vertical stitch
    (basic_transforms.py:37-74).  PIL is not available in this environment, so
    instead of re-encoding pixels we concatenate the base64 payloads with a
    deterministic separator and mark the result ``image/png``.  The *node
    semantics* (single combined ImageElement carrying the first image's bbox,
    empty text, merged with the page's text elements) match the reference;
    pixel stitching is an executor-side detail behind this function.
    """
    if not image_elements:
        raise ValueError("No images to combine.")
    blobs = [base64.b64decode(e.image or "") for e in image_elements]
    stitched = b"\x00OPSTITCH\x00".join(blobs)
    return ImageElement(
        bbox=image_elements[0].bbox,
        image=base64.b64encode(stitched).decode("utf-8"),
        image_mimetype="image/png",
        text="",
    )


def combine_sliced_images(nodes: List[Node]) -> List[Node]:
    nodes_by_page: Dict[int, List[Node]] = {}
    for node in nodes:
        pages = {element.bbox.page for element in node.elements}
        for page in pages:
            nodes_by_page.setdefault(page, []).append(node)

    new_nodes: List[Node] = []
    for page, page_nodes in nodes_by_page.items():
        image_nodes = [n for n in page_nodes if n.variant == frozenset({"image"})]
        if image_nodes:
            image_elements = [
                e
                for n in image_nodes
                for e in n.elements
                if isinstance(e, ImageElement)
            ]
            text_elements = [
                e
                for n in page_nodes
                for e in n.elements
                if isinstance(e, TextElement)
            ]
            combined_image = _combine_images_in_group(image_elements)
            new_nodes.append(Node(elements=(combined_image, *text_elements)))
        else:
            new_nodes.extend(page_nodes)
    return new_nodes


# ---------------------------------------------------------------------------
# P3 RemoveFullPageStubs — basic_transforms.py:174-201
# ---------------------------------------------------------------------------


def remove_full_page_stubs(max_area_pct: float) -> Transform:
    assert 0 <= max_area_pct <= 1

    def process(nodes: List[Node]) -> List[Node]:
        res = []
        for node in nodes:
            node_bbox = node.bbox[0]
            page_area = node_bbox.page_width * node_bbox.page_height
            if node.num_pages > 1:
                res.append(node)
            elif node_bbox.area / page_area < max_area_pct:
                res.append(node)
            elif not node.is_stub:
                res.append(node)
        return res

    return process


# ---------------------------------------------------------------------------
# P4/P8 CombineNodesSpatially — basic_transforms.py:278-327
# ---------------------------------------------------------------------------


def combine_nodes_spatially(
    x_error_margin: float = 0,
    y_error_margin: float = 0,
    criteria: str = "both_small",
) -> Transform:
    """Greedy order-dependent clustering; must run sequentially for equality."""

    both_small = criteria == "both_small"
    either_stub = criteria == "either_stub"
    xm, ym = x_error_margin, y_error_margin

    from bisect import insort

    def process(nodes: List[Node]) -> List[Node]:
        combined_nodes: List[Node] = []
        # page -> ascending indices of combined_nodes with a bbox on that
        # page.  Node.overlaps is same-page-only (reference
        # schemas.py:600-622), so scanning only same-page targets in
        # ascending index order finds the identical first greedy match —
        # but turns the reference's O(n^2) whole-list scan into
        # O(n x per-page density).  A 30k-element HTML turn dropped from
        # 73 s to sub-second with byte-identical output (SHA differential
        # + frozen goldens).
        page_index: dict = {}

        def register(idx: int, pages) -> None:
            for p in pages:
                insort(page_index.setdefault(p, []), idx)

        def append(node: Node, flat) -> None:
            idx = len(combined_nodes)
            combined_nodes.append(node)
            register(idx, {b[0] for b in flat})

        for current_node in nodes:
            # criteria is evaluated before the (expensive) overlap test —
            # same boolean AND as the reference, short-circuited cheap-first
            cur_stub = either_stub and current_node.is_stub
            cur_flat = current_node._bbox_flat
            if both_small and not current_node.is_small:
                append(current_node, cur_flat)
                continue
            # single-bbox fast path: the overlap arithmetic inlined (nodes
            # are overwhelmingly single-page; semantics identical to
            # Node.overlaps)
            single = cur_flat[0] if len(cur_flat) == 1 else None
            if single is not None:
                page, x0, y0, x1, y1 = single
                cand = page_index.get(page, ())
            else:
                lists = [
                    page_index[p]
                    for p in {b[0] for b in cur_flat}
                    if p in page_index
                ]
                if not lists:
                    cand = ()
                elif len(lists) == 1:
                    cand = lists[0]
                else:
                    cand = sorted(set().union(*lists))
            merge_i = -1
            for i in cand:
                target_node = combined_nodes[i]
                if both_small:
                    criteria_bool = target_node.is_small
                elif either_stub:
                    criteria_bool = cur_stub or target_node.is_stub
                else:
                    criteria_bool = False
                if not criteria_bool:
                    continue
                if single is not None:
                    hit = False
                    for tp, tx0, ty0, tx1, ty1 in target_node._bbox_flat:
                        if (
                            tp == page
                            and x0 - xm <= tx1 + xm
                            and tx0 - xm <= x1 + xm
                            and y0 - ym <= ty1 + ym
                            and ty0 - ym <= y1 + ym
                        ):
                            hit = True
                            break
                    if not hit:
                        continue
                elif not current_node.overlaps(target_node, xm, ym):
                    continue
                merge_i = i
                break
            if merge_i >= 0:
                # Node.__add__ == Node(target.elements + current.elements)
                # (reference basic_transforms.py:319-320) with derived
                # state pre-seeded from the parents' caches
                target_node = combined_nodes[merge_i]
                old_pages = {b[0] for b in target_node._bbox_flat}
                merged = target_node + current_node
                combined_nodes[merge_i] = merged
                register(
                    merge_i,
                    {b[0] for b in merged._bbox_flat} - old_pages,
                )
            else:
                append(current_node, cur_flat)
        return combined_nodes

    return process


# ---------------------------------------------------------------------------
# P5 CombineHeadingsWithClosestText — basic_transforms.py:352-377
# ---------------------------------------------------------------------------


def combine_headings_with_closest_text(nodes: List[Node]) -> List[Node]:
    res: List[Node] = []
    i = 0
    while i < len(nodes) - 1:
        current_node = nodes[i]
        if current_node.is_heading:
            next_node = nodes[i + 1]
            if not next_node.is_heading:
                res.append(current_node + next_node)
                i += 2
                continue
        res.append(current_node)
        i += 1
    if i == len(nodes) - 1:
        res.append(nodes[i])
    return res


# ---------------------------------------------------------------------------
# P6 CombineBullets — basic_transforms.py:330-349
# ---------------------------------------------------------------------------


def combine_bullets(nodes: List[Node]) -> List[Node]:
    combined_nodes: List[Node] = []
    i = 0
    while i < len(nodes):
        current_combination = nodes[i]
        while (
            i + 1 < len(nodes)
            and current_combination.ends_with_bullet
            and nodes[i + 1].starts_with_bullet
        ):
            current_combination = current_combination + nodes[i + 1]
            i += 1
        combined_nodes.append(current_combination)
        i += 1
    return combined_nodes


# ---------------------------------------------------------------------------
# P7 RemoveMetadataElements — basic_transforms.py:204-232
# ---------------------------------------------------------------------------


def remove_metadata_elements(
    min_y0_pct: float = 0.1, max_y0_pct: float = 0.90
) -> Transform:
    def process(nodes: List[Node]) -> List[Node]:
        res = []
        for node in nodes:
            if not node.elements:
                continue
            first_bbox = node.elements[0].bbox
            last_bbox = node.elements[-1].bbox
            # bug-compatible: multi-page nodes silently dropped (:221-223)
            if first_bbox.page != last_bbox.page:
                continue
            is_within_allowed_range = (
                first_bbox.y0 >= first_bbox.page_height * min_y0_pct
                and last_bbox.y1 <= first_bbox.page_height * max_y0_pct
            )
            if is_within_allowed_range or not node.is_stub:
                res.append(node)
        return res

    return process


# ---------------------------------------------------------------------------
# P9 RemoveRepeatedElements — basic_transforms.py:235-258
# ---------------------------------------------------------------------------


def remove_repeated_elements(threshold: int = 2) -> Transform:
    def process(nodes: List[Node]) -> List[Node]:
        text_counts: Dict[str, int] = {}
        for node in nodes:
            if node.text:
                text_counts[node.text] = text_counts.get(node.text, 0) + 1
        repeated = {t for t, c in text_counts.items() if c > threshold}
        return [n for n in nodes if not n.text or n.text not in repeated]

    return process


# ---------------------------------------------------------------------------
# P10 RemoveNodesBelowNTokens — basic_transforms.py:261-275
# ---------------------------------------------------------------------------


def remove_nodes_below_n_tokens(min_tokens: int) -> Transform:
    def process(nodes: List[Node]) -> List[Node]:
        return [
            n
            for n in nodes
            if not (n.tokens <= min_tokens and "image" not in n.variant)
        ]

    return process


# ---------------------------------------------------------------------------
# Pipelines — processing/ingest.py:37-44,70-92
# ---------------------------------------------------------------------------


def basic_pipeline_transforms() -> List[Transform]:
    """Exact BasicIngestionPipeline order + constants (ingest.py:70-92)."""
    return [
        remove_text_inside_tables,
        combine_sliced_images,
        remove_full_page_stubs(max_area_pct=0.35),
        combine_nodes_spatially(
            x_error_margin=10, y_error_margin=4, criteria="both_small"
        ),
        combine_headings_with_closest_text,
        combine_bullets,
        combine_nodes_spatially(
            x_error_margin=0, y_error_margin=10, criteria="both_small"
        ),
        remove_metadata_elements(),
        combine_nodes_spatially(criteria="either_stub"),
        remove_repeated_elements(threshold=2),
        remove_nodes_below_n_tokens(min_tokens=50),
        combine_bullets,
    ]


def run_pipeline(nodes: List[Node], transforms: List[Transform]) -> List[Node]:
    """Reference IngestionPipeline.run (ingest.py:37-44): sort before every step."""
    nodes = _sorted_nodes(nodes)
    for transform in transforms:
        nodes = transform(_sorted_nodes(nodes))
    return nodes


def run_basic_pipeline(nodes: List[Node]) -> List[Node]:
    return run_pipeline(nodes, basic_pipeline_transforms())
