"""Unitable (B10) autoregressive decode, import-guarded like the DETR path.

Reference behavior: ``tables/unitable/core.py:76-183`` — three greedy
autoregressive decodes (structure 512 steps / bbox 1024 / cell 200, batched)
over a 448x448 table crop, each constrained by a token whitelist or
blacklist, followed by the token-stream cleanup + HTML rebuild that
``functions/unitable.py`` already golden-tests against the reference's 20
recorded predictions.

Round-4 status was "decode out of scope" (torch absent; upstream's own e2e
test is disabled).  Round 5 closes the testable half of that gap with the
same split the DETR and text-embedding paths use:

- the **decode loop** (:func:`autoregressive_decode`) is pure numpy over an
  injectable ``step_fn(contexts) -> last-position logits`` — exactly what
  ``model.generator(model.decode(memory, context, ...))[:, -1, :]`` hands
  over.  Loop semantics are the reference's, bug-compatibly: the loop stops
  only when EVERY batch row contains ``eos_id`` (core.py:95-97), so a row
  that finished early KEEPS acquiring greedy tokens until the slowest row
  catches up; the cap is ``max_decode_len`` ITERATIONS (appended tokens),
  not total context length; whitelist/blacklist masking sets banned logits
  to -inf BEFORE the softmax-argmax (utils.py:34-55).  Fully differential-
  tested in this environment on scripted step functions.
- the **model driver** (:class:`UnitableExtractor`) only touches torch
  inside methods, loads the three checkpoints lazily once per Python worker
  (executor-singleton), and constructs only where torch exists — its
  ``step_fn`` closures feed the SAME tested numpy loop, so activating real
  weights exercises no untested control flow.

At cluster scale the crops arrive as binary columns inside the existing
``mapInPandas`` table stage (one decode batch per Arrow batch), the same
placement as the DETR structure model — no collect, no driver round-trip.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from open_parse_spark.functions.unitable import (
    bbox_str_to_token_list,
    build_table_from_html_and_cell,
    cell_str_to_token_list,
    clean_cell_text,
    html_str_to_token_list,
    html_table_template,
)

Size = Tuple[int, int]
BBox = Tuple[int, int, int, int]

# reference core.py:38-52 — unitable's own normalization statistics
UNITABLE_MEAN = (0.86597056, 0.88463002, 0.87491087)
UNITABLE_STD = (0.20686628, 0.18201602, 0.18485524)
STRUCTURE_SIZE = (448, 448)  # core.py:191
CELL_SIZE = (112, 448)  # core.py:164
MAX_DECODE = {"html": 512, "bbox": 1024, "cell": 200}  # core.py:124,144,172


def torch_unitable_available() -> bool:
    """True when the real-model path can run (torch + tokenizers)."""
    try:
        import tokenizers  # noqa: F401
        import torch  # noqa: F401
    except ImportError:
        return False
    return True


# ---------------------------------------------------------------------------
# numpy decode primitives (reference utils.py:26-55, tensor ops -> numpy)
# ---------------------------------------------------------------------------


def subsequent_mask_np(size: int, pad: int = 0) -> np.ndarray:
    """Causal attention mask; reference utils.py:26-31 (True = masked)."""
    out = np.triu(np.ones((size, size), dtype=bool), k=1)
    if pad and pad > 0:
        out[:pad] = False
    return out


def pred_token_within_range_np(
    pred: np.ndarray,
    white_list: Optional[Sequence[int]] = None,
    black_list: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Constrain logits to a token range; reference utils.py:34-46.
    Exactly one of white/black list may be given (same assert).

    Bug-compatible by design: the reference gates on TRUTHINESS
    (``if white_list:``, utils.py:40), so an EMPTY whitelist means
    "unconstrained", not "mask everything" — this port keeps that exact
    semantic because the decode differentials pin equality with the
    reference's own code.  The one divergence is defensive: the reference
    falls through to ``pred[..., None] = -inf`` when both lists are None
    (a tensor-corrupting no-constraint call); the ``if black_list:`` guard
    here makes that call a clean no-op instead."""
    assert white_list is None or black_list is None
    pred = np.array(pred, dtype=np.float64, copy=True)
    if white_list:
        black_list = list(set(range(pred.shape[-1])) - set(white_list))
    if black_list:
        pred[..., list(black_list)] = -np.inf
    return pred


def greedy_sampling_np(logits: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(probs, ids) of the argmax token per row; reference utils.py:49-54.
    The softmax is monotone, so argmax(logits) == argmax(probs); probs are
    returned for parity with the reference's topk(1) output."""
    logits = np.asarray(logits, dtype=np.float64)
    shifted = logits - logits.max(axis=-1, keepdims=True)
    e = np.exp(shifted)
    probs = e / e.sum(axis=-1, keepdims=True)
    ids = probs.argmax(axis=-1)
    return probs[np.arange(len(ids)), ids], ids


StepFn = Callable[[np.ndarray], np.ndarray]  # (B, T) int contexts -> (B, V)


def autoregressive_decode(
    step_fn: StepFn,
    batch_size: int,
    prefix: Sequence[int],
    max_decode_len: int,
    eos_id: int,
    token_whitelist: Optional[Sequence[int]] = None,
    token_blacklist: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """The reference decode loop (core.py:76-113) over an injectable step.

    ``step_fn`` receives the full (B, T) integer context and returns the
    LAST position's (B, V) logits — the exact array
    ``model.generator(model.decode(memory, context, ...))[:, -1, :]``
    yields after ``.detach().cpu().numpy()``.  Returns the final (B, T')
    context including the prefix.  Bug-compatible reference semantics:

    - stop condition checked at loop TOP: all rows already contain eos
      (so the token that completes the LAST row is still appended, and
      finished rows keep extending greedily until then);
    - at most ``max_decode_len`` tokens are appended;
    - white/black list masking applies at every step to every row.
    """
    context = np.tile(
        np.asarray(list(prefix), dtype=np.int64), (batch_size, 1)
    )
    for _ in range(max_decode_len):
        if all((row == eos_id).any() for row in context):
            break
        logits = np.asarray(step_fn(context), dtype=np.float64)
        if logits.shape != (batch_size, logits.shape[-1]) or logits.ndim != 2:
            raise ValueError(
                f"step_fn must return (B, V) last-position logits, got "
                f"{logits.shape}"
            )
        logits = pred_token_within_range_np(
            logits, white_list=token_whitelist, black_list=token_blacklist
        )
        _, next_tokens = greedy_sampling_np(logits)
        context = np.concatenate([context, next_tokens[:, None]], axis=1)
    return context


def ids_to_str(ids: Sequence[int], id2token: Dict[int, str]) -> str:
    """Token ids -> space-joined token string, the shape the reference's
    ``vocab.decode(..., skip_special_tokens=False)`` hands to
    ``html_str_to_token_list``/``cell_str_to_token_list`` (both re-split on
    contiguous spaces, so the join is lossless for this consumer)."""
    return " ".join(id2token[int(i)] for i in ids)


def rescale_bbox(
    bboxes: List[BBox], src: Size, tgt: Size
) -> List[Tuple[int, int, int, int]]:
    """Decode-grid (448x448) boxes -> table-image coordinates; reference
    core.py:56-74 (round per coordinate)."""
    wr, hr = tgt[0] / src[0], tgt[1] / src[1]
    return [
        (round(x0 * wr), round(y0 * hr), round(x1 * wr), round(y1 * hr))
        for x0, y0, x1, y1 in bboxes
    ]


def decoded_to_table_html(
    structure_ids: Sequence[int],
    cell_ids_batch: Sequence[Sequence[int]],
    structure_id2token: Dict[int, str],
    cell_id2token: Dict[int, str],
) -> str:
    """Everything downstream of the decodes, composed from the golden-tested
    rebuild pieces: token-id streams -> cleaned token lists -> merged table
    HTML in the reference's document template (core.py:176-205)."""
    pred_html = html_str_to_token_list(
        ids_to_str(structure_ids, structure_id2token)
    )
    cells = [
        clean_cell_text(cell_str_to_token_list(ids_to_str(ids, cell_id2token)))
        for ids in cell_ids_batch
    ]
    table_str = "".join(build_table_from_html_and_cell(pred_html, cells))
    return html_table_template(table_str)


# ---------------------------------------------------------------------------
# the executor-singleton real-model extractor
# ---------------------------------------------------------------------------

_MODELS: Dict[str, Any] = {}


class UnitableExtractor:
    """Real unitable inference behind the tested decode loop.  Construct
    only where :func:`torch_unitable_available`; the module itself imports
    torch-free so it ships everywhere.  ``weights`` maps
    {"structure"|"bbox"|"cell": (checkpoint_path, vocab_path)} — the
    upstream unitable release artifacts."""

    def __init__(
        self,
        weights: Dict[str, Tuple[str, str]],
        model_factory=None,
        device: str = "cpu",
    ):
        if not torch_unitable_available():
            raise ImportError(
                "UnitableExtractor needs torch and tokenizers; the numpy "
                "decode loop + HTML rebuild remain usable without them"
            )
        self.weights = weights
        # the upstream unitable release artifacts are STATE DICTS, not
        # pickled modules (reference unitable_model.py:49-63 builds the
        # EncoderDecoder and load_state_dict()s into it) — a factory
        # ``(task, vocab) -> nn.Module`` supplies that architecture here
        # (ADVICE r5: torch.load of a state_dict has no .eval/.decode and
        # crashed the real-model path on the documented artifacts)
        self.model_factory = model_factory
        self.device = device

    def _load(self, task: str):
        key = f"unitable:{task}:{self.weights[task][0]}:{self.device}"
        if key not in _MODELS:
            import torch  # noqa: F401
            from tokenizers import Tokenizer

            ckpt_path, vocab_path = self.weights[task]
            vocab = Tokenizer.from_file(vocab_path)
            loaded = torch.load(ckpt_path, map_location="cpu")
            if isinstance(loaded, dict) and not hasattr(loaded, "eval"):
                # state-dict artifact (the documented upstream format)
                if self.model_factory is None:
                    raise ValueError(
                        f"{ckpt_path} is a state_dict; pass model_factory="
                        "(task, vocab) -> nn.Module building the unitable "
                        "EncoderDecoder architecture to load it into "
                        "(mirror reference unitable_model.load_vocab_and_model)"
                    )
                model = self.model_factory(task, vocab)
                model.load_state_dict(loaded)
            else:
                model = loaded
            model.eval()
            model = model.to(self.device)
            _MODELS[key] = (model, vocab)
        return _MODELS[key]

    def _step_fn(self, model, memory) -> StepFn:
        """Close the torch forward over the tested numpy loop's contract."""
        import torch

        def step(context_np: np.ndarray) -> np.ndarray:
            # tensors follow the model's device (ADVICE r5: a cpu-built
            # context fed to a cuda model crashes decode)
            context = torch.from_numpy(context_np.astype("int32")).to(
                self.device
            )
            mask = torch.from_numpy(
                subsequent_mask_np(context.shape[1])
            ).to(self.device)
            with torch.no_grad():
                logits = model.decode(
                    memory, context, tgt_mask=mask, tgt_padding_mask=None
                )
                logits = model.generator(logits)[:, -1, :]
            return logits.detach().cpu().numpy()

        return step

    def decode_task(
        self,
        task: str,
        image_tensor,
        batch_size: int,
        token_whitelist: Optional[Sequence[int]] = None,
        token_blacklist: Optional[Sequence[int]] = None,
    ) -> np.ndarray:
        """One reference decode (core.py:118-183) through the numpy loop."""
        import torch

        model, vocab = self._load(task)
        with torch.no_grad():
            memory = model.encode(image_tensor)
        prefix = [vocab.token_to_id(f"[{task if task != 'structure' else 'html'}]")]
        return autoregressive_decode(
            self._step_fn(model, memory),
            batch_size=batch_size,
            prefix=prefix,
            max_decode_len=MAX_DECODE[
                "html" if task == "structure" else task
            ],
            eos_id=vocab.token_to_id("<eos>"),
            token_whitelist=token_whitelist,
            token_blacklist=token_blacklist,
        )
