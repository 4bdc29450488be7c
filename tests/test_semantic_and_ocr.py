"""P11 semantic merge, OCR line assembly (T6), and CombineSlicedImages (P2)."""

import base64

from open_parse_spark.core.model import Bbox, ImageElement, Node, TextElement
from open_parse_spark.core.semantic import (
    HashingEmbeddings,
    combine_nodes_semantically,
    cosine_similarity,
)
from open_parse_spark.core.spans import (
    is_bold_flags,
    is_italic_flags,
    lines_from_ocr_output,
)
from open_parse_spark.core.transforms import combine_sliced_images


def _node(text, y0, y1, page=0):
    return Node(
        elements=(
            TextElement(
                text=text,
                lines=(),
                bbox=Bbox(
                    page=page,
                    page_height=792.0,
                    page_width=612.0,
                    x0=72,
                    y0=y0,
                    x1=540,
                    y1=y1,
                ),
            ),
        )
    )


def test_cosine_similarity():
    assert cosine_similarity([1, 0], [1, 0]) == 1.0
    assert cosine_similarity([1, 0], [0, 1]) == 0.0
    assert cosine_similarity([0, 0], [1, 0]) == 0.0  # zero vector guard


def test_hashing_embeddings_deterministic():
    emb = HashingEmbeddings(dim=16)
    a = emb.embed_many(["hello world", "", "hello world"])
    assert a[0] == a[2]
    assert a[1] == [0.0] * 16


def test_semantic_merge_similar_neighbors():
    # identical texts -> cosine 1.0 -> merge (token cap permitting)
    nodes = [
        _node("alpha beta gamma", 700, 712),
        _node("alpha beta gamma", 680, 692),
        _node("totally different words entirely unrelated", 100, 112),
    ]
    step = combine_nodes_semantically(
        HashingEmbeddings().embed_many, min_similarity=0.99, max_tokens=512
    )
    out = step(nodes)
    assert len(out) == 2
    assert out[0].text.count("alpha beta gamma") == 2


def test_semantic_merge_respects_token_cap():
    nodes = [_node("same text", 700, 712), _node("same text", 680, 692)]
    step = combine_nodes_semantically(
        HashingEmbeddings().embed_many, min_similarity=0.99, max_tokens=1
    )
    assert len(step(nodes)) == 2


# --- OCR line assembly (reference text/pymupdf/core.py:7-66) ---


def test_font_flags():
    assert is_bold_flags(2**4) and not is_bold_flags(2**1)
    assert is_italic_flags(2**1) and not is_italic_flags(2**4)


def test_lines_from_ocr_output_merges_overlapping():
    lines = [
        {"bbox": (0, 0, 50, 10), "spans": [{"text": "Hel", "flags": 0, "size": 11}]},
        {"bbox": (45, 0, 90, 10), "spans": [{"text": "lo", "flags": 0, "size": 11}]},
        {"bbox": (0, 50, 50, 60), "spans": [{"text": "далеко", "flags": 16, "size": 11}]},
    ]
    out = lines_from_ocr_output(lines)
    assert len(out) == 2
    # merged line combines spans and unions bboxes
    assert out[0].bbox == (0, 0, 90, 10)
    # combine() puts the incoming line's spans first (reference
    # text/pymupdf/core.py:61: combined[i] = line_element.combine(other))
    assert "".join(s.text for s in out[0].spans) == "loHel"
    assert out[1].spans[0].is_bold is True


def test_lines_from_ocr_not_merged_at_different_heights():
    lines = [
        {"bbox": (0, 0, 50, 10), "spans": [{"text": "a", "flags": 0, "size": 11}]},
        {"bbox": (0, 8, 50, 18), "spans": [{"text": "b", "flags": 0, "size": 11}]},
    ]
    # overlap yes, but y0 differs by 8 > margin 0 -> no merge
    assert len(lines_from_ocr_output(lines)) == 2


# --- P2 CombineSlicedImages (reference basic_transforms.py:32-119) ---


def _img_node(y0, y1, payload=b"img"):
    return Node(
        elements=(
            ImageElement(
                text="",
                bbox=Bbox(
                    page=0, page_height=792, page_width=612, x0=100, y0=y0, x1=200, y1=y1
                ),
                image=base64.b64encode(payload).decode(),
                image_mimetype="image/png",
            ),
        )
    )


def test_combine_sliced_images_merges_page_images_with_text():
    nodes = [
        _img_node(500, 600, b"top"),
        _img_node(400, 500, b"bottom"),
        _node("caption text under the image", 380, 392),
    ]
    out = combine_sliced_images(nodes)
    assert len(out) == 1
    assert out[0].variant == frozenset({"image", "text"})
    combined_img = out[0].elements[0]
    assert combined_img.image_mimetype == "image/png"
    blob = base64.b64decode(combined_img.image)
    assert b"top" in blob and b"bottom" in blob
    # bbox of combined image = first image's bbox (reference :69-74)
    assert combined_img.bbox.y0 == 500


def test_combine_sliced_images_noop_without_images():
    nodes = [_node("just text", 700, 712)]
    assert combine_sliced_images(nodes) == nodes
