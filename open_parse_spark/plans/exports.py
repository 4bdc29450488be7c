"""Sinks / exports (SURVEY §2.5).

- K1 document assembly: nodes -> per-document rows with metadata.
- K2 llama-index-style relations: PREV/NEXT/PARENT links computed as window
  functions over the stable (conv_id, turn_idx, node_idx) order — the
  distributed analog of ``ParsedDocument.to_llama_index_nodes``
  (reference schemas.py:707-762).  Node ids are deterministic content
  hashes, not uuid4 (SURVEY §4.3.5).
- K4 markdown render: pure function over node element records
  (reference schemas.py:650-667).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def nodes_with_relations(nodes: DataFrame) -> DataFrame:
    """Add deterministic node ids + PREV/NEXT/PARENT relation columns.

    prev/next follow reading order within a document (= one turn); parent is
    the document id.  Pure window functions — one shuffle on the partition
    key, already the natural output clustering."""
    doc_key = [F.col("conv_id"), F.col("turn_idx")]
    node_id = F.sha2(
        F.concat_ws(
            "\x00",
            F.col("conv_id"),
            F.col("turn_idx").cast("string"),
            F.col("node_idx").cast("string"),
            F.coalesce(F.col("text"), F.lit("")),
        ),
        256,
    )
    w = Window.partitionBy(*doc_key).orderBy("node_idx")
    parent_id = F.sha2(
        F.concat_ws("\x00", F.col("conv_id"), F.col("turn_idx").cast("string")), 256
    )
    out = nodes.withColumn("node_id", node_id)
    return (
        out.withColumn("prev_id", F.lag("node_id").over(w))
        .withColumn("next_id", F.lead("node_id").over(w))
        .withColumn("parent_id", parent_id)
    )


def documents_assembly(nodes: DataFrame) -> DataFrame:
    """K1: one row per document (turn) with ordered node texts + metadata
    (reference doc_parser.py:113-126; uuid/file dates excluded)."""
    return (
        nodes.groupBy("conv_id", "turn_idx")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("node_idx"), F.col("text")))
            ).alias("_n"),
            F.max("end_page").alias("max_page"),
            F.sum("tokens").alias("tokens"),
            F.count(F.lit(1)).alias("num_nodes"),
        )
        .select(
            "conv_id",
            "turn_idx",
            F.col("_n.text").alias("node_texts"),
            (F.col("max_page") + 1).alias("num_pages"),
            "tokens",
            "num_nodes",
        )
    )


def nodes_bbox_debug(nodes: DataFrame, prefix_len: int = 60) -> DataFrame:
    """K3 human-inspectable bbox debug table: one row per (node, page bbox)
    with a text prefix — the tabular stand-in for the reference's
    bbox-annotated PDF sink (``pdf.py:152-227``, which draws rectangles and
    asserts nothing).  Map-only explode; write it next to the node table and
    any page's layout is one filtered scan away."""
    return nodes.select(
        "conv_id",
        "turn_idx",
        "node_idx",
        F.explode("bbox").alias("b"),
        F.substring("text", 1, prefix_len).alias("text_prefix"),
        "tokens",
    ).select(
        "conv_id",
        "turn_idx",
        "node_idx",
        F.col("b.page").alias("page"),
        F.round("b.x0", 2).alias("x0"),
        F.round("b.y0", 2).alias("y0"),
        F.round("b.x1", 2).alias("x1"),
        F.round("b.y1", 2).alias("y1"),
        "text_prefix",
        "tokens",
    )


def render_markdown(
    variants: List[str],
    texts: List[str],
    images: List[str],
    image_mimes: Optional[List[str]] = None,
) -> str:
    """K4 ``Node._repr_markdown_`` (reference schemas.py:650-667): join
    element renders with blank lines; text and table elements render their
    text, images inline as base64 data URIs using the element's mimetype
    (``unknown`` falls back to image/png exactly as the reference does)."""
    parts = []
    mimes = image_mimes or ["unknown"] * len(variants)
    for variant, text, image, mime in zip(variants, texts, images, mimes):
        if variant == "image":
            if mime == "unknown":
                mime = "image/png"
            parts.append(f"![Image](data:{mime};base64,{image})")
        else:
            parts.append(text)
    return "\n\n".join(parts)
