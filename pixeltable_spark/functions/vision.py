"""Vision functions (reference functions/vision.py:176-1428): bbox
geometry + detection evaluation. Pure math — fully implementable without
image libraries (numpy only), executed as Arrow-batched pandas UDFs.

Boxes are [x1, y1, x2, y2] float arrays; detections are JSON structs.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BOX = T.ArrayType(T.DoubleType())


def bbox_area(box: Column) -> Column:
    """(x2-x1)*(y2-y1), native column math via element_at."""
    x1, y1 = F.element_at(box, 1), F.element_at(box, 2)
    x2, y2 = F.element_at(box, 3), F.element_at(box, 4)
    return F.greatest(x2 - x1, F.lit(0.0)) * F.greatest(y2 - y1, F.lit(0.0))


def bboxes_scale(box: Column, sx: float, sy: float) -> Column:
    return F.array(
        F.element_at(box, 1) * sx, F.element_at(box, 2) * sy,
        F.element_at(box, 3) * sx, F.element_at(box, 4) * sy,
    )


def bboxes_shift(box: Column, dx: float, dy: float) -> Column:
    return F.array(
        F.element_at(box, 1) + dx, F.element_at(box, 2) + dy,
        F.element_at(box, 3) + dx, F.element_at(box, 4) + dy,
    )


def bboxes_clip(box: Column, width: float, height: float) -> Column:
    """Clip to image bounds (reference bboxes_clip)."""
    def cl(v: Column, hi: float) -> Column:
        return F.least(F.greatest(v, F.lit(0.0)), F.lit(float(hi)))
    return F.array(
        cl(F.element_at(box, 1), width), cl(F.element_at(box, 2), height),
        cl(F.element_at(box, 3), width), cl(F.element_at(box, 4), height),
    )


def bbox_iou(a: Column, b: Column) -> Column:
    """Intersection-over-union, fully native column math."""
    ix1 = F.greatest(F.element_at(a, 1), F.element_at(b, 1))
    iy1 = F.greatest(F.element_at(a, 2), F.element_at(b, 2))
    ix2 = F.least(F.element_at(a, 3), F.element_at(b, 3))
    iy2 = F.least(F.element_at(a, 4), F.element_at(b, 4))
    inter = F.greatest(ix2 - ix1, F.lit(0.0)) * F.greatest(iy2 - iy1, F.lit(0.0))
    union = bbox_area(a) + bbox_area(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def bboxes_convert(box: Column, src: str = "xyxy", dst: str = "xywh") -> Column:
    """Box format conversion (reference bboxes_convert): xyxy <-> xywh <->
    cxcywh, all native column math."""
    x1, y1 = F.element_at(box, 1), F.element_at(box, 2)
    a3, a4 = F.element_at(box, 3), F.element_at(box, 4)
    if src == "xyxy":
        xy = (x1, y1, a3, a4)
    elif src == "xywh":
        xy = (x1, y1, x1 + a3, y1 + a4)
    elif src == "cxcywh":
        xy = (x1 - a3 / 2, y1 - a4 / 2, x1 + a3 / 2, y1 + a4 / 2)
    else:
        raise ValueError(f"unknown box format {src!r}")
    bx1, by1, bx2, by2 = xy
    if dst == "xyxy":
        return F.array(bx1, by1, bx2, by2)
    if dst == "xywh":
        return F.array(bx1, by1, bx2 - bx1, by2 - by1)
    if dst == "cxcywh":
        return F.array((bx1 + bx2) / 2, (by1 + by2) / 2, bx2 - bx1, by2 - by1)
    raise ValueError(f"unknown box format {dst!r}")


def bboxes_resize(box: Column, orig_w: float, orig_h: float,
                  new_w: float, new_h: float) -> Column:
    """Rescale boxes after an image resize (reference bboxes_resize)."""
    return bboxes_scale(box, new_w / orig_w, new_h / orig_h)


def bboxes_pad(box: Column, pad_x: float, pad_y: float) -> Column:
    """Shift boxes after padding the canvas (reference bboxes_pad)."""
    return bboxes_shift(box, pad_x, pad_y)


def bboxes_crop(box: Column, crop_x1: float, crop_y1: float,
                crop_x2: float, crop_y2: float) -> Column:
    """Re-express boxes in a cropped image's coordinates, clipped to the
    crop bounds (reference bboxes_crop)."""
    shifted = bboxes_shift(box, -crop_x1, -crop_y1)
    return bboxes_clip(shifted, crop_x2 - crop_x1, crop_y2 - crop_y1)


def bboxes_resize_canvas(box: Column, orig_w: float, orig_h: float,
                         new_w: float, new_h: float) -> Column:
    """Letterbox transform: scale to fit + center offset
    (reference bboxes_resize_canvas)."""
    s = min(new_w / orig_w, new_h / orig_h)
    dx = (new_w - orig_w * s) / 2
    dy = (new_h - orig_h * s) / 2
    return bboxes_shift(bboxes_scale(box, s, s), dx, dy)


def bboxes_draw(img: Column, boxes: Column) -> Column:
    """Rasterize boxes onto the image (reference bboxes_draw). Needs PIL;
    stub = deterministic hash of payload + box coords."""
    import hashlib

    @F.pandas_udf(T.BinaryType())
    def fn(p_s, b_s):
        out = []
        for p, bs in zip(p_s, b_s):
            if p is None:
                out.append(None)
            else:
                boxes_list = [] if bs is None else [list(b) for b in bs]
                key = json.dumps(boxes_list).encode()
                out.append(hashlib.md5(p + key + b"draw").digest())
        return pd.Series(out)
    return fn(img, boxes)


def overlay_segmentation(img: Column, mask: Column,
                         alpha: float = 0.5) -> Column:
    """Blend a segmentation mask over the image (reference
    overlay_segmentation); stub at the raster boundary."""
    import hashlib

    @F.pandas_udf(T.BinaryType())
    def fn(p_s, m_s):
        out = []
        for p, m in zip(p_s, m_s):
            if p is None or m is None:
                out.append(None)
            else:
                out.append(hashlib.md5(p + m + f"seg{alpha}".encode()).digest())
        return pd.Series(out)
    return fn(img, mask)


def _iou_py(a, b) -> float:
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
    area = lambda r: max(r[2] - r[0], 0.0) * max(r[3] - r[1], 0.0)  # noqa: E731
    union = area(a) + area(b) - inter
    return inter / union if union > 0 else 0.0


def eval_detections(df: DataFrame,
                    pred_boxes: str = "pred_boxes",
                    pred_labels: str = "pred_labels",
                    pred_scores: str = "pred_scores",
                    gt_boxes: str = "gt_boxes",
                    gt_labels: str = "gt_labels",
                    iou_threshold: float = 0.5,
                    id_col: str = "image_id") -> DataFrame:
    """Per-image detection evaluation (reference functions/vision.py
    eval_detections): greedy score-ordered matching at an IoU threshold,
    emitting per-image TP/FP/FN counts + precision/recall. mAP-style
    aggregation composes on top with a groupBy."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("tp", T.LongType()),
        T.StructField("fp", T.LongType()),
        T.StructField("fn", T.LongType()),
        T.StructField("precision", T.DoubleType()),
        T.StructField("recall", T.DoubleType()),
    ])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            def aslist(v, default=None):
                if v is None:
                    return list(default or [])
                return [list(x) if hasattr(x, "__len__") and not isinstance(x, (int, float, str)) else x
                        for x in v]

            for _, r in pdf.iterrows():
                pb = aslist(r[pred_boxes])
                pl = aslist(r[pred_labels])
                ps = aslist(r[pred_scores], default=[1.0] * len(pb)) or [1.0] * len(pb)
                gb = aslist(r[gt_boxes])
                gl = aslist(r[gt_labels])
                order = sorted(range(len(pb)), key=lambda i: -ps[i])
                matched: set[int] = set()
                tp = 0
                for i in order:
                    best_j, best_iou = -1, iou_threshold
                    for j in range(len(gb)):
                        if j in matched or gl[j] != pl[i]:
                            continue
                        iou = _iou_py(pb[i], gb[j])
                        if iou >= best_iou:
                            best_j, best_iou = j, iou
                    if best_j >= 0:
                        matched.add(best_j)
                        tp += 1
                fp = len(pb) - tp
                fn = len(gb) - tp
                rows.append({
                    id_col: r[id_col], "tp": tp, "fp": fp, "fn": fn,
                    "precision": tp / (tp + fp) if (tp + fp) else 0.0,
                    "recall": tp / (tp + fn) if (tp + fn) else 0.0,
                })
            yield pd.DataFrame(rows, columns=[id_col, "tp", "fp", "fn",
                                              "precision", "recall"])

    return df.mapInPandas(op, out_schema)
