"""P11 CombineNodesSemantically + embedding clients.

Reference: ``/root/reference/src/openparse/processing/semantic_transforms.py``.

The reference's only RPC is OpenAI embeddings (batch 256, re-embedding all
node texts every fixpoint iteration, :40-59,86-92).  That is not reproducible
offline, so the default client here is a deterministic local hashing
embedder; an OpenAI-compatible client can be plugged in via the same
``embed_many`` interface, and ``operators/embed_torch.py`` provides the
import-guarded REAL-MODEL client (executor-singleton transformer encoder,
same contract, hashing fallback via ``get_embedder``) for environments
where torch exists.  Every oracle and the reference differential pin the
hashing embedder — the real client changes vectors, not semantics.  The merge loop itself is replicated exactly —
including the quirk that a merged node keeps its pre-merge embedding until
the next outer iteration re-embeds everything (:104-109).
"""

from __future__ import annotations

import math
import re
from typing import Callable, List, Sequence

from open_parse_spark.core.model import Node
from open_parse_spark.core.transforms import Transform, _sorted_nodes

_WORD_RE = re.compile(r"[a-z0-9]+")


def cosine_similarity(a: Sequence[float], b: Sequence[float]) -> float:
    """Reference: semantic_transforms.py:14-17."""
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (na * nb)


class HashingEmbeddings:
    """Deterministic local embedding stub: hashed bag-of-words into ``dim``
    buckets.  Same text -> same vector on every machine, no RPC.  Implements
    the reference client's ``embed_many`` contract incl. zero-vectors for
    empty texts (semantic_transforms.py:40-59)."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def _embed(self, text: str) -> List[float]:
        vec = [0.0] * self.dim
        for word in _WORD_RE.findall(text.lower()):
            h = _fnv1a(word)
            vec[h % self.dim] += 1.0 if (h >> 16) & 1 else -1.0
        return vec

    def embed_many(self, texts: List[str]) -> List[List[float]]:
        return [
            [0.0] * self.dim if not text else self._embed(text) for text in texts
        ]


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def combine_nodes_semantically(
    embed_many: Callable[[List[str]], List[List[float]]],
    min_similarity: float,
    max_tokens: int,
) -> Transform:
    """Fixpoint adjacent-pair merge; reference semantic_transforms.py:86-112."""

    def process(nodes: List[Node]) -> List[Node]:
        nodes = list(nodes)
        modified = True
        while modified:
            modified = False
            nodes = _sorted_nodes(nodes)
            embeddings = embed_many([node.text for node in nodes])
            i = 0
            while i < len(nodes) - 1:
                similarity = cosine_similarity(embeddings[i], embeddings[i + 1])
                is_within_token_limit = (
                    nodes[i].tokens + nodes[i + 1].tokens <= max_tokens
                )
                if similarity >= min_similarity and is_within_token_limit:
                    nodes[i] = nodes[i] + nodes[i + 1]
                    del nodes[i + 1]
                    del embeddings[i + 1]
                    modified = True
                    continue
                i += 1
        return nodes

    return process


def semantic_pipeline_transforms(
    embed_many: Callable[[List[str]], List[List[float]]] = None,
    min_tokens: int = 256,
    max_tokens: int = 1024,
) -> List[Transform]:
    """Exact SemanticIngestionPipeline order + constants
    (processing/ingest.py:95-136)."""
    from open_parse_spark.core.transforms import (
        combine_bullets,
        combine_headings_with_closest_text,
        combine_nodes_spatially,
        combine_sliced_images,
        remove_full_page_stubs,
        remove_metadata_elements,
        remove_nodes_below_n_tokens,
        remove_repeated_elements,
        remove_text_inside_tables,
    )

    if embed_many is None:
        embed_many = HashingEmbeddings().embed_many
    return [
        remove_text_inside_tables,
        combine_sliced_images,
        remove_full_page_stubs(max_area_pct=0.35),
        combine_nodes_spatially(
            x_error_margin=10, y_error_margin=2, criteria="both_small"
        ),
        combine_headings_with_closest_text,
        combine_bullets,
        remove_metadata_elements(),
        remove_repeated_elements(threshold=2),
        remove_nodes_below_n_tokens(min_tokens=10),
        combine_bullets,
        combine_nodes_semantically(
            embed_many, min_similarity=0.6, max_tokens=max_tokens // 2
        ),
        combine_nodes_semantically(
            embed_many, min_similarity=0.55, max_tokens=max_tokens
        ),
        remove_nodes_below_n_tokens(min_tokens=min_tokens),
    ]
