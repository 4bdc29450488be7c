"""Real text-embedding path behind the ``embed_many`` contract, import-guarded.

Reference behavior: ``src/openparse/processing/semantic_transforms.py:40-59``
— the reference's embedding client batches node texts (256 per call) against
the OpenAI embeddings API and returns one vector per text.  That RPC is not
reproducible offline, so this repo's default is the deterministic
:class:`~open_parse_spark.core.semantic.HashingEmbeddings` stub (every
oracle pins it).  This module is the REAL-MODEL sibling, built exactly like
the DETR path in ``operators/tables_torch.py`` (VERDICT r4 ask #4):

- the **tensor-to-vector adapter** (:func:`mean_pool`, :func:`l2_normalize`,
  :func:`pool_and_normalize`) is pure numpy over the ``(last_hidden_state,
  attention_mask)`` arrays a transformers encoder hands over via
  ``outputs.last_hidden_state.detach().cpu().numpy()`` — contract-tested in
  this environment on recorded arrays, no torch needed;
- the **model driver** (:class:`TorchTextEmbedder`) only touches torch
  inside methods, loads tokenizer+encoder lazily ONCE per Python worker
  process (the executor-singleton pattern: with ``spark.python.worker.reuse``
  every Arrow batch after the first hits a warm model), and constructs only
  when :func:`torch_text_available`;
- :func:`get_embedder` is the factory every consumer goes through: the
  hashing stub where torch is absent, the real model where it exists — both
  expose the same ``embed_many(texts) -> list[vector]`` contract, including
  zero-vectors for empty texts.

At cluster scale the checkpoint rides to executors via a warmed HF cache (or
a baked image); inference happens inside :func:`embed_documents`'s
``mapInPandas`` Arrow stage, one text batch at a time — no collect, no
driver round-trip, zero shuffles.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from pyspark.sql import DataFrame

# a standard public sentence-encoder checkpoint; mean-pooled + L2-normalized
# per its model card (the adapter below implements exactly that recipe)
EMBED_CHECKPOINT = "sentence-transformers/all-MiniLM-L6-v2"
EMBED_BATCH = 256  # the reference client's batch size (semantic_transforms.py:46)


def torch_text_available() -> bool:
    """True when the real-model path can run (torch + transformers)."""
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError:
        return False
    return True


# ---------------------------------------------------------------------------
# numpy output-shape adapter — the exact arrays the encoder hands over
# ---------------------------------------------------------------------------


def mean_pool(last_hidden: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
    """Mask-weighted token mean: (B, T, H) hidden states + (B, T) 0/1 mask
    -> (B, H) sentence vectors.  Padding tokens contribute nothing; an
    all-zero mask (empty tokenization) yields a zero vector, not NaN."""
    last_hidden = np.asarray(last_hidden, dtype=np.float64)
    mask = np.asarray(attention_mask, dtype=np.float64)
    if last_hidden.ndim != 3 or mask.ndim != 2:
        raise ValueError(
            f"expected (B,T,H) hidden + (B,T) mask, got {last_hidden.shape} "
            f"/ {mask.shape}"
        )
    weighted = last_hidden * mask[:, :, None]
    denom = mask.sum(axis=1, keepdims=True)
    out = weighted.sum(axis=1)
    nz = denom[:, 0] > 0
    out[nz] = out[nz] / denom[nz]
    out[~nz] = 0.0
    return out


def l2_normalize(vecs: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalization; zero rows stay zero (no division blowup —
    the contract's empty-text zero-vector survives)."""
    vecs = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    safe = np.where(norms > 0, norms, 1.0)
    return vecs / safe


def pool_and_normalize(
    last_hidden: np.ndarray, attention_mask: np.ndarray
) -> np.ndarray:
    """The full adapter: encoder outputs -> unit sentence vectors."""
    return l2_normalize(mean_pool(last_hidden, attention_mask))


# ---------------------------------------------------------------------------
# the executor-singleton real-model embedder
# ---------------------------------------------------------------------------

# one tokenizer+model pair per Python worker process; with
# spark.python.worker.reuse (the default) this is the executor singleton
_MODELS: Dict[str, Any] = {}


class TorchTextEmbedder:
    """Real transformer sentence embeddings behind the ``embed_many``
    contract.  Construct only where :func:`torch_text_available`; import of
    this class itself is torch-free so the module ships everywhere."""

    def __init__(
        self,
        checkpoint: str = EMBED_CHECKPOINT,
        batch_size: int = EMBED_BATCH,
        max_length: int = 256,
        device: Optional[str] = None,
    ):
        if not torch_text_available():
            raise ImportError(
                "TorchTextEmbedder needs torch and transformers; use "
                "HashingEmbeddings (core/semantic.py) where they are absent"
            )
        self.checkpoint = checkpoint
        self.batch_size = batch_size
        self.max_length = max_length
        self.device = device

    def _load(self):
        # device is part of the key: two embedders with different devices in
        # one worker must not share a model homed on the wrong device
        # (review finding — enc tensors are moved per self.device at encode
        # time, so a cache hit across devices would mix devices or silently
        # run on the wrong one)
        key = f"text-embed:{self.checkpoint}:{self.device or 'default'}"
        if key not in _MODELS:
            import torch
            from transformers import AutoModel, AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(self.checkpoint)
            model = AutoModel.from_pretrained(self.checkpoint)
            model.eval()
            if self.device:
                model.to(self.device)
            _MODELS[key] = (tokenizer, model, torch)
        return _MODELS[key]

    def embed_many(self, texts: List[str]) -> List[List[float]]:
        """One unit vector per text; empty/None texts -> zero vectors
        (the HashingEmbeddings / reference-client contract,
        semantic_transforms.py:40-59)."""
        tokenizer, model, torch = self._load()
        hidden = model.config.hidden_size
        out: List[Optional[List[float]]] = [None] * len(texts)
        todo = [(i, t) for i, t in enumerate(texts) if t]
        for i, t in enumerate(texts):
            if not t:
                out[i] = [0.0] * hidden
        for start in range(0, len(todo), self.batch_size):
            chunk = todo[start : start + self.batch_size]
            enc = tokenizer(
                [t for _, t in chunk],
                padding=True,
                truncation=True,
                max_length=self.max_length,
                return_tensors="pt",
            )
            if self.device:
                enc = {k: v.to(self.device) for k, v in enc.items()}
            with torch.no_grad():
                outputs = model(**enc)
            vecs = pool_and_normalize(
                outputs.last_hidden_state.detach().cpu().numpy(),
                enc["attention_mask"].detach().cpu().numpy(),
            )
            for (i, _), v in zip(chunk, vecs):
                out[i] = [float(x) for x in v]
        return out  # type: ignore[return-value]


def get_embedder(dim: int = 64, prefer_torch: bool = True):
    """The factory every consumer goes through: the real model when the
    stack exists (and ``prefer_torch``), else the deterministic hashing
    stub — both satisfy ``embed_many``.  Mirrors ``tables_torch.
    get_detector``'s stub fallback."""
    if prefer_torch and torch_text_available():
        return TorchTextEmbedder()
    from open_parse_spark.core.semantic import HashingEmbeddings

    return HashingEmbeddings(dim=dim)


def embed_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    prefer_torch: bool = True,
    batch_size: int = EMBED_BATCH,
) -> DataFrame:
    """Spark stage: one embedding per document via Arrow ``mapInPandas`` —
    zero shuffles, model loaded once per worker through the factory.

    Output: (``id_col``, embedding array<double>).  With torch absent the
    vectors are the deterministic hashing-stub vectors (dim=``dim``); with
    torch present they are real model vectors (dim = the checkpoint's hidden
    size) — same schema either way, so downstream ANN/merge operators don't
    care which leg produced them."""
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    in_schema = df.schema
    id_field = in_schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("embedding", ArrayType(DoubleType()), False),
        ]
    )

    # decide the embedder ONCE on the driver (ADVICE r5): resolving inside
    # the closure made the embedding dimension depend on each worker's
    # torch availability — a heterogeneous-executor or driver/executor
    # mismatch silently mixed 64-dim hashing vectors and model vectors in
    # one column.  Workers that cannot honor the driver's decision raise.
    use_torch = bool(prefer_torch and torch_text_available())

    def run(batches):
        if use_torch and not torch_text_available():
            raise RuntimeError(
                "driver resolved the torch text embedder but this worker "
                "lacks torch/transformers — install them on every executor "
                "or call embed_documents(prefer_torch=False)"
            )
        emb = get_embedder(dim=dim, prefer_torch=use_torch)
        for pdf in batches:
            texts = ["" if t is None else str(t) for t in pdf[text_col]]
            vecs: List[List[float]] = []
            for start in range(0, len(texts), batch_size):
                vecs.extend(emb.embed_many(texts[start : start + batch_size]))
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": vecs})

    return df.select(id_col, text_col).mapInPandas(run, out_schema)
