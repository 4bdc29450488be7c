"""Real table-transformers (DETR) inference path for B4/B5, import-guarded.

Reference behavior: ``tables/table_transformers/ml.py:39-205`` (detection —
MaxResize(800) + ImageNet normalize, forward, softmax-max decode, cxcywh ->
xyxy rescale, drop "no object", confidence gate) and ``ml.py:321-356``
(structure — padded crop via ``tables/utils.py:15-50``, MaxResize(1000),
same decode, cropped -> full-image coordinate lift, then the shared grid
assembly ``table_from_model_outputs``).

Torch, transformers and PIL are absent in this sandbox, so the design splits
cleanly in two:

- the **tensor-to-object adapter** (:func:`outputs_to_objects` and the
  ``decode_*`` wrappers) is pure numpy over ``(logits, pred_boxes)`` arrays —
  exactly what ``outputs.logits.detach().cpu().numpy()`` hands over — and is
  contract-tested in this environment;
- the **model driver** (:class:`TorchTableDetector`) only touches torch
  inside methods, loads both checkpoints lazily ONCE per Python worker
  process (the executor-singleton pattern: with ``spark.python.worker.reuse``
  every Arrow batch after the first hits warm models), and activates only
  when :func:`torch_available` — the stub fallback in ``tables_ml.py`` is
  unchanged.

At cluster scale the models ride to executors via ``--py-files`` + a warmed
HF cache (or a baked image); inference happens inside the existing
``mapInPandas`` Arrow stage, one page-image batch at a time — no collect, no
driver round-trip.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from open_parse_spark.operators.tables_ml import (
    BBox,
    Size,
    Table,
    TableCellModelOutput,
    TableDetector,
    TableModelOutput,
    convert_cropped_cords_to_full_img_cords,
    table_from_model_outputs,
)

# reference ml.py:68-83 — detection resizes the long edge to 800, structure
# to 1000; both normalize with the ImageNet statistics
DETECTION_MAX_SIZE = 800
STRUCTURE_MAX_SIZE = 1000
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
DETECTION_CHECKPOINT = "microsoft/table-transformer-detection"
STRUCTURE_CHECKPOINT = "microsoft/table-transformer-structure-recognition"
CROP_PADDING_PCT = 0.05  # reference ml.py:322 OFFSET


def torch_available() -> bool:
    """True when the real-model path can run (torch + transformers + PIL)."""
    try:
        import PIL.Image  # noqa: F401
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError:
        return False
    return True


# ---------------------------------------------------------------------------
# numpy output-shape adapter (reference ml.py:97-181, tensor ops -> numpy)
# ---------------------------------------------------------------------------


def box_cxcywh_to_xyxy(boxes: np.ndarray) -> np.ndarray:
    """(N, 4) center/size -> corner boxes; reference ml.py:97-108."""
    cx, cy, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    return np.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=1
    )


def rescale_bboxes(boxes: np.ndarray, size: Size) -> np.ndarray:
    """Normalized cxcywh -> absolute xyxy at ``size``; reference ml.py:113-126."""
    width, height = size
    return box_cxcywh_to_xyxy(boxes) * np.array(
        [width, height, width, height], dtype=np.float32
    )


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def outputs_to_objects(
    logits: np.ndarray,
    pred_boxes: np.ndarray,
    img_size: Size,
    id2label: Dict[int, str],
) -> List[Dict[str, Any]]:
    """Decode one image's raw DETR head outputs into labeled boxes.

    ``logits``: (1, N, C) or (N, C) raw class scores; ``pred_boxes``:
    (1, N, 4) or (N, 4) normalized cxcywh.  Per query: softmax over classes,
    argmax label + its probability as confidence, drop "no object"
    (reference ml.py:130-148).  The caller passes ``id2label`` extended with
    the no-object class at index C-1, exactly as the reference builds it from
    ``model.config.id2label``.
    """
    logits = np.asarray(logits, dtype=np.float64)
    pred_boxes = np.asarray(pred_boxes, dtype=np.float64)
    if logits.ndim == 3:
        logits = logits[0]
    if pred_boxes.ndim == 3:
        pred_boxes = pred_boxes[0]
    probs = _softmax(logits, axis=-1)
    labels = probs.argmax(axis=-1)
    scores = probs.max(axis=-1)
    boxes = rescale_bboxes(pred_boxes, img_size)
    objects = []
    for label, score, bbox in zip(labels, scores, boxes):
        class_label = id2label[int(label)]
        if class_label == "no object":
            continue
        objects.append(
            {
                "label": class_label,
                "score": float(score),
                "bbox": [float(c) for c in bbox],
            }
        )
    return objects


def decode_detection(
    logits: np.ndarray,
    pred_boxes: np.ndarray,
    img_size: Size,
    id2label: Dict[int, str],
    min_table_confidence: float,
) -> List[TableModelOutput]:
    """Detection head -> confidence-gated tables; reference ml.py:168-205."""
    return [
        TableModelOutput(
            label=o["label"], confidence=o["score"], bbox=tuple(o["bbox"])
        )
        for o in outputs_to_objects(logits, pred_boxes, img_size, id2label)
        if o["score"] > min_table_confidence
    ]


def decode_structure(
    logits: np.ndarray,
    pred_boxes: np.ndarray,
    img_size: Size,
    id2label: Dict[int, str],
) -> List[TableCellModelOutput]:
    """Structure head -> cell outputs (ungated here: the assembly applies
    ``min_cell_confidence`` per cell class); reference ml.py:152-165."""
    return [
        TableCellModelOutput(
            label=o["label"], confidence=o["score"], bbox=tuple(o["bbox"])
        )
        for o in outputs_to_objects(logits, pred_boxes, img_size, id2label)
    ]


# ---------------------------------------------------------------------------
# image utilities (reference tables/utils.py:15-50; PIL imported lazily)
# ---------------------------------------------------------------------------


def crop_img_with_padding(image, bbox: BBox, padding_pct: float = 0):
    """Crop ``bbox`` and frame it in white padding; reference utils.py:15-50."""
    if padding_pct < 0:
        raise ValueError("Padding percentage must be non-negative")
    if padding_pct >= 1:
        raise ValueError("Padding percentage must be less than 1")
    from PIL import Image
    left, top, right, bottom = map(int, bbox)
    if not (0 <= left < right <= image.width) or not (
        0 <= top < bottom <= image.height
    ):
        raise ValueError("Bounding box is out of the image boundaries")
    cropped = image.crop((left, top, right, bottom))
    width, height = right - left, bottom - top
    padding_x = int(width * padding_pct)
    padding_y = int(height * padding_pct)
    padded = Image.new(
        "RGB", (width + 2 * padding_x, height + 2 * padding_y), color="white"
    )
    padded.paste(cropped, (padding_x, padding_y))
    return padded


def _max_resize(image, max_size: int):
    """Long edge -> ``max_size`` preserving aspect; reference ml.py:43-55."""
    width, height = image.size
    scale = max_size / max(width, height)
    return image.resize((int(round(scale * width)), int(round(scale * height))))


# ---------------------------------------------------------------------------
# the executor-singleton real-model detector
# ---------------------------------------------------------------------------

# one copy of each model per Python worker process; with
# spark.python.worker.reuse (the default) this is the executor singleton
_MODELS: Dict[str, Any] = {}


class TorchTableDetector(TableDetector):
    """Real microsoft/table-transformer inference behind the
    :class:`TableDetector` protocol.  Construct only where
    :func:`torch_available`; import of this class itself is torch-free so the
    module can be shipped everywhere.
    """

    def __init__(
        self,
        min_table_confidence: float = 0.75,
        device: Optional[str] = None,
    ):
        if not torch_available():
            raise ImportError(
                "TorchTableDetector needs torch, transformers and PIL; use "
                "StubTableDetector (tables_ml.py) where they are absent"
            )
        self.min_table_confidence = min_table_confidence
        self._device = device

    # -- lazy executor-singleton loading ----------------------------------

    def _models(self):
        if "detection" not in _MODELS:
            import torch
            from transformers import (
                AutoModelForObjectDetection,
                TableTransformerForObjectDetection,
            )

            device = self._device or (
                "cuda" if torch.cuda.is_available() else "cpu"
            )
            det = AutoModelForObjectDetection.from_pretrained(
                DETECTION_CHECKPOINT, revision="no_timm"
            ).to(device)
            st = TableTransformerForObjectDetection.from_pretrained(
                STRUCTURE_CHECKPOINT, revision="no_timm"
            ).to(device)
            det.eval()
            st.eval()
            _MODELS.update(detection=det, structure=st, device=device)
        return _MODELS

    def _preprocess(self, image, max_size: int):
        """MaxResize + ToTensor + ImageNet Normalize as a (1,3,H,W) tensor
        (reference ml.py:68-83; resampling is PIL default as in MaxResize)."""
        import torch

        resized = _max_resize(image.convert("RGB"), max_size)
        arr = np.asarray(resized, dtype=np.float32) / 255.0
        arr = (arr - np.array(IMAGENET_MEAN, dtype=np.float32)) / np.array(
            IMAGENET_STD, dtype=np.float32
        )
        return torch.from_numpy(arr.transpose(2, 0, 1)).unsqueeze(0)

    @staticmethod
    def _id2label(model) -> Dict[int, str]:
        # reference ml.py:191-194 — append the no-object class
        base = dict(model.config.id2label)
        return {**base, len(base): "no object"}

    def _forward(self, model, pixel_values):
        import torch

        m = self._models()
        with torch.no_grad():
            out = model(pixel_values.to(m["device"]))
        return (
            out.logits.detach().cpu().numpy(),
            out["pred_boxes"].detach().cpu().numpy(),
        )

    # -- protocol ----------------------------------------------------------

    def find_table_bboxes(self, image) -> List[TableModelOutput]:
        m = self._models()
        logits, boxes = self._forward(
            m["detection"], self._preprocess(image, DETECTION_MAX_SIZE)
        )
        return decode_detection(
            logits,
            boxes,
            image.size,
            self._id2label(m["detection"]),
            self.min_table_confidence,
        )

    def find_cells(self, table_image) -> List[TableCellModelOutput]:
        m = self._models()
        logits, boxes = self._forward(
            m["structure"], self._preprocess(table_image, STRUCTURE_MAX_SIZE)
        )
        return decode_structure(
            logits, boxes, table_image.size, self._id2label(m["structure"])
        )


def get_detector(min_table_confidence: float = 0.75, **stub_kwargs) -> TableDetector:
    """The real detector when the env can run it, else the deterministic stub
    — callers never branch on torch themselves."""
    if torch_available():
        return TorchTableDetector(min_table_confidence=min_table_confidence)
    from open_parse_spark.operators.tables_ml import StubTableDetector

    return StubTableDetector(**stub_kwargs)


def get_table_content(
    detector: TableDetector,
    page_img,
    page_dims: Size,
    table_bbox: BBox,
    min_cell_confidence: float,
) -> Table:
    """B5 driver, reference ml.py:321-356: padded crop -> structure model ->
    lift cell boxes back to full-image coordinates -> grid assembly."""
    table_img = crop_img_with_padding(
        page_img, table_bbox, padding_pct=CROP_PADDING_PCT
    )
    cells = detector.find_cells(table_img)
    for cell in cells:
        cell.bbox = convert_cropped_cords_to_full_img_cords(
            padding_pct=CROP_PADDING_PCT,
            cropped_image_size=table_img.size,
            table_bbox=cell.bbox,
            bbox=table_bbox,
        )
    return table_from_model_outputs(
        image_size=page_img.size,
        page_size=page_dims,
        table_bbox=table_bbox,
        table_cells=cells,
        min_cell_confidence=min_cell_confidence,
    )
