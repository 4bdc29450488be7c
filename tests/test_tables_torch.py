"""Import-guarded real-model path (operators/tables_torch.py): the numpy
tensor-to-object adapter is the exact shape ``outputs.logits.detach().cpu()
.numpy()`` hands over, so it is fully testable without torch; the driver
class must refuse to construct here and the factory must fall back to the
stub unchanged (VERDICT r2 item 2)."""

import json
import math
import os

import numpy as np
import pytest

from open_parse_spark.operators.tables_ml import (
    StubTableDetector,
    TableCellModelOutput,
    table_from_model_outputs,
)
from open_parse_spark.operators.tables_torch import (
    TorchTableDetector,
    box_cxcywh_to_xyxy,
    crop_img_with_padding,
    decode_detection,
    decode_structure,
    get_detector,
    outputs_to_objects,
    rescale_bboxes,
    torch_available,
)

# public id2label of microsoft/table-transformer-structure-recognition with
# the appended no-object class, as _id2label builds it from model config
STRUCTURE_ID2LABEL = {
    0: "table",
    1: "table column",
    2: "table row",
    3: "table column header",
    4: "table projected row header",
    5: "table spanning cell",
    6: "no object",
}
DETECTION_ID2LABEL = {0: "table", 1: "table rotated", 2: "no object"}


def _logits_for(label_idx: int, n_classes: int, strength: float = 8.0):
    row = np.zeros(n_classes)
    row[label_idx] = strength
    return row


def _cxcywh_for(xyxy, img_size):
    w, h = img_size
    x0, y0, x1, y1 = xyxy
    return [
        ((x0 + x1) / 2) / w,
        ((y0 + y1) / 2) / h,
        (x1 - x0) / w,
        (y1 - y0) / h,
    ]


def test_box_conversion_roundtrip():
    boxes = np.array([[0.5, 0.5, 0.2, 0.4], [0.1, 0.9, 0.2, 0.2]])
    xyxy = box_cxcywh_to_xyxy(boxes)
    np.testing.assert_allclose(xyxy[0], [0.4, 0.3, 0.6, 0.7], atol=1e-12)
    scaled = rescale_bboxes(boxes, (100, 200))
    np.testing.assert_allclose(scaled[0], [40.0, 60.0, 60.0, 140.0], atol=1e-9)


def test_adapter_drops_no_object_and_batch_dim():
    img_size = (792, 612)
    want = [
        ("table row", (56.0, 180.0, 702.0, 196.0)),
        ("table column", (56.0, 180.0, 150.0, 460.0)),
    ]
    logits = [
        _logits_for(2, 7),
        _logits_for(6, 7),  # no object -> dropped
        _logits_for(1, 7),
    ]
    boxes = [
        _cxcywh_for(want[0][1], img_size),
        _cxcywh_for((0, 0, 10, 10), img_size),
        _cxcywh_for(want[1][1], img_size),
    ]
    # batch dim present (1, N, C)/(1, N, 4), exactly the model output shape
    objs = outputs_to_objects(
        np.array([logits]), np.array([boxes]), img_size, STRUCTURE_ID2LABEL
    )
    assert [(o["label"],) for o in objs] == [("table row",), ("table column",)]
    for o, (_, bbox) in zip(objs, want):
        np.testing.assert_allclose(o["bbox"], bbox, atol=1e-6)
        assert 0.9 < o["score"] < 1.0
    # same answer without the batch dim
    objs2 = outputs_to_objects(
        np.array(logits), np.array(boxes), img_size, STRUCTURE_ID2LABEL
    )
    assert objs == objs2


def test_adapter_confidence_is_softmax_probability():
    logits = np.array([[2.0, 1.0, 0.0]])
    boxes = np.array([[0.5, 0.5, 0.5, 0.5]])
    (obj,) = outputs_to_objects(logits, boxes, (10, 10), DETECTION_ID2LABEL)
    want = math.exp(2.0) / (math.exp(2.0) + math.exp(1.0) + 1.0)
    assert abs(obj["score"] - want) < 1e-12


def test_decode_detection_applies_confidence_gate():
    img_size = (612, 792)
    logits = np.array([_logits_for(0, 3, 8.0), _logits_for(0, 3, 0.4)])
    boxes = np.array(
        [
            _cxcywh_for((50, 100, 500, 400), img_size),
            _cxcywh_for((10, 10, 20, 20), img_size),
        ]
    )
    out = decode_detection(
        logits, boxes, img_size, DETECTION_ID2LABEL, min_table_confidence=0.75
    )
    assert len(out) == 1 and out[0].label == "table"
    np.testing.assert_allclose(out[0].bbox, (50, 100, 500, 400), atol=1e-6)


def test_structure_decode_feeds_recorded_grid_assembly():
    """End-to-end output-shape contract: raw (logits, boxes) crafted from the
    recorded naic-page-94 DETR cells decode back to the same labels/boxes,
    and the decoded cells assemble to the same grid as the fixture does."""
    p = os.path.join(os.path.dirname(__file__), "goldens", "naic_page94_cells.json")
    with open(p) as f:
        recorded = [
            TableCellModelOutput(label=label, confidence=conf, bbox=tuple(bbox))
            for label, conf, bbox in json.load(f)
        ]
    img_size = (792, 612)
    label2id = {v: k for k, v in STRUCTURE_ID2LABEL.items()}
    logits = np.array([_logits_for(label2id[c.label], 7, 9.0) for c in recorded])
    boxes = np.array([_cxcywh_for(c.bbox, img_size) for c in recorded])
    decoded = decode_structure(logits, boxes, img_size, STRUCTURE_ID2LABEL)
    assert [c.label for c in decoded] == [c.label for c in recorded]
    for d, r in zip(decoded, recorded):
        np.testing.assert_allclose(d.bbox, r.bbox, atol=1e-4)
    table_bbox = (56.02, 180.17, 702.35, 460.68)
    # min_cell_confidence=0.95 < softmax(9 vs 6 zeros) ~ 0.9993
    got = table_from_model_outputs(img_size, (792.0, 612.0), table_bbox, decoded, 0.95)
    want = table_from_model_outputs(img_size, (792.0, 612.0), table_bbox, recorded, 0.95)
    assert got.to_html_str() == want.to_html_str()


def test_factory_falls_back_to_stub_without_torch():
    if torch_available():  # pragma: no cover - sandbox has no torch
        pytest.skip("torch present; fallback branch not reachable")
    det = get_detector(n_rows=3, n_cols=2)
    assert isinstance(det, StubTableDetector)
    assert det.n_rows == 3
    with pytest.raises(ImportError, match="StubTableDetector"):
        TorchTableDetector()


def test_crop_padding_validation_matches_reference():
    # pure-validation branches raise before any PIL import is attempted
    with pytest.raises(ValueError, match="non-negative"):
        crop_img_with_padding(None, (0, 0, 1, 1), padding_pct=-0.1)
    with pytest.raises(ValueError, match="less than 1"):
        crop_img_with_padding(None, (0, 0, 1, 1), padding_pct=1.0)


def test_torch_detector_driver_with_injected_modules(monkeypatch):
    """Drive the REAL TorchTableDetector methods (preprocess -> forward ->
    decode) by injecting minimal fake torch/transformers/PIL modules — the
    only sandbox-side way to execute the guarded driver code itself rather
    than just its numpy adapter."""
    import sys
    import types

    import numpy as np

    class FakeTensor:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

        def unsqueeze(self, axis):
            return FakeTensor(np.expand_dims(self.arr, axis))

        def to(self, device):
            return self

    class FakeOutput:
        def __init__(self, logits, boxes):
            self._d = {"pred_boxes": _FakeResult(boxes)}
            self.logits = _FakeResult(logits)

        def __getitem__(self, k):
            return self._d[k]

    class _FakeResult:
        def __init__(self, arr):
            self.arr = np.asarray(arr, dtype=np.float64)

        def detach(self):
            return self

        def cpu(self):
            return self

        def numpy(self):
            return self.arr

    det_logits = [[
        [9.0, 0.0, 0.0],   # table, high conf
        [0.0, 0.0, 9.0],   # no object
    ]]
    det_boxes = [[[0.5, 0.5, 0.5, 0.5], [0.1, 0.1, 0.1, 0.1]]]

    class FakeModel:
        def __init__(self, id2label):
            self.config = types.SimpleNamespace(id2label=id2label)

        def to(self, device):
            return self

        def eval(self):
            return self

        def __call__(self, pixel_values):
            assert pixel_values.arr.shape[0] == 1  # batch dim present
            assert pixel_values.arr.shape[1] == 3  # CHW
            return FakeOutput(det_logits, det_boxes)

    fake_torch = types.ModuleType("torch")
    fake_torch.from_numpy = lambda a: FakeTensor(a)
    fake_torch.no_grad = lambda: __import__("contextlib").nullcontext()
    fake_torch.cuda = types.SimpleNamespace(is_available=lambda: False)

    fake_tf = types.ModuleType("transformers")
    fake_tf.AutoModelForObjectDetection = types.SimpleNamespace(
        from_pretrained=lambda name, revision: FakeModel({0: "table", 1: "table rotated"})
    )
    fake_tf.TableTransformerForObjectDetection = types.SimpleNamespace(
        from_pretrained=lambda name, revision: FakeModel(
            {i: lbl for i, lbl in enumerate([
                "table", "table column", "table row", "table column header",
                "table projected row header", "table spanning cell"])}
        )
    )

    class FakeImage:
        size = (100, 200)
        width, height = 100, 200

        def convert(self, mode):
            return self

        def resize(self, size):
            out = FakeImage()
            out.size = size
            return out

        def __array__(self, dtype=None, copy=None):
            w, h = self.size
            return np.zeros((h, w, 3), dtype=dtype or np.uint8)

    fake_pil = types.ModuleType("PIL")
    fake_pil_image = types.ModuleType("PIL.Image")
    fake_pil.Image = fake_pil_image

    import open_parse_spark.operators.tables_torch as tt

    monkeypatch.setitem(sys.modules, "torch", fake_torch)
    monkeypatch.setitem(sys.modules, "transformers", fake_tf)
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_pil_image)
    monkeypatch.setattr(tt, "_MODELS", {})

    assert tt.torch_available()
    det = tt.TorchTableDetector()
    tables = det.find_table_bboxes(FakeImage())
    assert len(tables) == 1 and tables[0].label == "table"
    # cxcywh (0.5,0.5,0.5,0.5) at (100,200) -> (25, 50, 75, 150)
    np.testing.assert_allclose(tables[0].bbox, (25.0, 50.0, 75.0, 150.0))
    # models loaded once per process (executor singleton)
    first = tt._MODELS["detection"]
    det.find_table_bboxes(FakeImage())
    assert tt._MODELS["detection"] is first
