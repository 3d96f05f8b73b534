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


def _to_xyxy(b: Column, fmt: str):
    c1, c2 = F.element_at(b, 1), F.element_at(b, 2)
    c3, c4 = F.element_at(b, 3), F.element_at(b, 4)
    if fmt == "xyxy":
        return c1, c2, c3, c4
    if fmt == "xywh":
        return c1, c2, c1 + c3, c2 + c4
    if fmt == "cxcywh":
        return (c1 - c3 / 2, c2 - c4 / 2, c1 + c3 / 2, c2 + c4 / 2)
    raise ValueError(f"unknown bbox format {fmt!r}")


def _from_xyxy(x1, y1, x2, y2, fmt: str) -> Column:
    if fmt == "xyxy":
        return F.array(x1, y1, x2, y2)
    if fmt == "xywh":
        return F.array(x1, y1, x2 - x1, y2 - y1)
    if fmt == "cxcywh":
        return F.array((x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1)
    raise ValueError(f"unknown bbox format {fmt!r}")


def bboxes_clip_to_canvas(bboxes: Column, format: str = "xyxy",  # noqa: A002
                          width: Optional[int] = None,
                          height: Optional[int] = None,
                          min_visibility: float = 0.0,
                          min_area: float = 0.0) -> Column:
    """Clip a LIST of boxes to the canvas, dropping boxes whose clipped
    area falls under min_area or whose visible fraction falls under
    min_visibility (reference functions/vision.py:950
    bboxes_clip_to_canvas) — pure higher-order column math: one
    transform + one filter, no UDF."""
    if (width is None) != (height is None):
        raise ValueError(
            "bboxes_clip_to_canvas(): both width and height must be "
            "specified for absolute coordinates")
    w = float(width) if width is not None else 1.0
    h = float(height) if height is not None else 1.0

    def clip_one(b):
        x1, y1, x2, y2 = _to_xyxy(b, format)
        cx1 = F.least(F.greatest(x1, F.lit(0.0)), F.lit(w))
        cy1 = F.least(F.greatest(y1, F.lit(0.0)), F.lit(h))
        cx2 = F.least(F.greatest(x2, F.lit(0.0)), F.lit(w))
        cy2 = F.least(F.greatest(y2, F.lit(0.0)), F.lit(h))
        orig = F.greatest(x2 - x1, F.lit(0.0)) * F.greatest(y2 - y1, F.lit(0.0))
        new = F.greatest(cx2 - cx1, F.lit(0.0)) * F.greatest(cy2 - cy1, F.lit(0.0))
        vis = F.when(orig > 0, new / orig).otherwise(F.lit(0.0))
        # carry the metrics through a 6-element array, filter, then strip
        return F.concat(_from_xyxy(cx1, cy1, cx2, cy2, format),
                        F.array(new, vis))

    clipped = F.transform(bboxes, clip_one)
    kept = F.filter(clipped, lambda b: (F.element_at(b, 5) >= F.lit(float(min_area)))
                    & (F.element_at(b, 6) >= F.lit(float(min_visibility)))
                    & (F.element_at(b, 5) > 0))
    return F.transform(kept, lambda b: F.slice(b, 1, 4))


def bboxes_crop_canvas(bboxes: Column, format: str = "xyxy",  # noqa: A002
                       canvas_region: "list | None" = None,
                       canvas_region_format: str = "xyxy",
                       canvas_width: Optional[int] = None,
                       canvas_height: Optional[int] = None) -> Column:
    """Re-express boxes relative to a cropped canvas region (reference
    functions/vision.py:1071 bboxes_crop_canvas): shift by the region
    origin; relative coordinates additionally rescale by the region size.
    Boxes may extend beyond the new canvas (the reference's contract)."""
    if (canvas_width is None) != (canvas_height is None):
        raise ValueError(
            "bboxes_crop_canvas(): both canvas_width and canvas_height "
            "must be specified for absolute coordinates")
    if canvas_region is None or len(canvas_region) != 4:
        raise ValueError(
            "bboxes_crop_canvas(): canvas_region must be a list of 4 "
            "coordinates")
    r = [float(v) for v in canvas_region]
    if canvas_region_format == "xywh":
        rx1, ry1, rx2, ry2 = r[0], r[1], r[0] + r[2], r[1] + r[3]
    elif canvas_region_format == "cxcywh":
        rx1, ry1 = r[0] - r[2] / 2, r[1] - r[3] / 2
        rx2, ry2 = r[0] + r[2] / 2, r[1] + r[3] / 2
    elif canvas_region_format == "xyxy":
        rx1, ry1, rx2, ry2 = r
    else:
        raise ValueError(f"unknown bbox format {canvas_region_format!r}")
    absolute = canvas_width is not None
    rw, rh = rx2 - rx1, ry2 - ry1

    def crop_one(b):
        x1, y1, x2, y2 = _to_xyxy(b, format)
        if absolute:
            nx1, ny1, nx2, ny2 = x1 - rx1, y1 - ry1, x2 - rx1, y2 - ry1
        else:
            nx1, ny1 = (x1 - rx1) / rw, (y1 - ry1) / rh
            nx2, ny2 = (x2 - rx1) / rw, (y2 - ry1) / rh
        return _from_xyxy(nx1, ny1, nx2, ny2, format)

    return F.transform(bboxes, crop_one)


# ---------------------------------------------------------------------------
# mean average precision (reference functions/vision.py:235 mean_ap) —
# distributed PR-curve formulation instead of the reference's
# collect-everything aggregator
# ---------------------------------------------------------------------------

def detection_pr_events(df: DataFrame,
                        pred_boxes: str = "pred_boxes",
                        pred_labels: str = "pred_labels",
                        pred_scores: str = "pred_scores",
                        gt_boxes: str = "gt_boxes",
                        gt_labels: str = "gt_labels",
                        iou_threshold: float = 0.5,
                        id_col: str = "image_id") -> DataFrame:
    """Per-PREDICTION match events — the reference's DetectionEval tp/fp
    arrays (vision.py:176 eval_detections), exploded to one row per
    prediction: (image, category, score, pred_idx, is_tp). Matching is
    the same greedy score-ordered IoU>=thr, same-label, each gt claimed
    once. A narrow mapInPandas — events of one image never leave its
    partition; the mAP windows downstream do the only shuffle (by class)."""
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("category", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("pred_idx", T.IntegerType()),
        T.StructField("is_tp", T.IntegerType()),
    ])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            def _lst(v):
                return [] if v is None else list(v)

            for _, r in pdf.iterrows():
                pb = [list(b) for b in _lst(r[pred_boxes])]
                pl = _lst(r[pred_labels])
                ps = _lst(r[pred_scores]) or [1.0] * len(pb)
                gb = [list(b) for b in _lst(r[gt_boxes])]
                gl = _lst(r[gt_labels])
                order = sorted(range(len(pb)), key=lambda i: -ps[i])
                matched: set[int] = set()
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
                    rows.append({id_col: r[id_col], "category": int(pl[i]),
                                 "score": float(ps[i]), "pred_idx": int(i),
                                 "is_tp": 1 if best_j >= 0 else 0})
            yield pd.DataFrame(
                rows, columns=[id_col, "category", "score", "pred_idx", "is_tp"])

    return df.mapInPandas(op, out_schema)


def gt_class_counts(df: DataFrame, gt_labels: str = "gt_labels") -> DataFrame:
    """(category, num_gts) across the corpus — one explode + groupBy."""
    return (df.select(F.explode(F.col(gt_labels)).alias("category"))
            .groupBy("category").agg(F.count(F.lit(1)).alias("num_gts")))


def mean_ap(df: DataFrame,
            pred_boxes: str = "pred_boxes", pred_labels: str = "pred_labels",
            pred_scores: str = "pred_scores", gt_boxes: str = "gt_boxes",
            gt_labels: str = "gt_labels", iou_threshold: float = 0.5,
            id_col: str = "image_id") -> DataFrame:
    """Per-class average precision (reference vision.py:235 mean_ap,
    VOC-style "area" AP with the monotone precision envelope), computed
    with per-class windows instead of collecting every score to one
    process:

    * events = per-prediction (class, score, is_tp) rows (narrow)
    * one window per class ordered (score DESC, image, pred_idx) — a
      TOTAL order, so results are deterministic where the reference's
      arrival-order argsort tie-breaks are not — gives integer tp/fp
      cumsums, hence exact precision/recall at every rank
    * the envelope max(precision[i:]) is the same window reversed
    * AP = sum(is_tp * envelope)/num_gts; the envelope is quantized to
      the 2^-20 grid first so each term is exactly representable and the
      per-class sum is association-independent (bit-stable across
      partitionings and engines; error bound 2^-20 per point)

    Two shuffles total (events by class, gt counts), both keyed; no
    driver-side state. Returns (category, ap); overall mAP = avg(ap).
    Classes with ground truth but no predictions get ap = 0.0."""
    from pyspark.sql import Window as W

    ev = detection_pr_events(df, pred_boxes, pred_labels, pred_scores,
                             gt_boxes, gt_labels, iou_threshold, id_col)
    gts = gt_class_counts(df, gt_labels)
    fwd = (W.partitionBy("category")
           .orderBy(F.col("score").desc(), F.col(id_col), F.col("pred_idx"))
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    rev = (W.partitionBy("category")
           .orderBy(F.col("score").asc(), F.col(id_col).desc(),
                    F.col("pred_idx").desc())
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    eps = 1.1920928955078125e-07  # np.finfo(np.float32).eps, as the reference
    ranked = (ev
              .withColumn("tp_cum", F.sum("is_tp").over(fwd))
              .withColumn("rank", F.count(F.lit(1)).over(fwd))
              .withColumn("prec", F.col("tp_cum")
                          / F.greatest(F.col("rank").cast("double"), F.lit(eps))))
    q = float(1 << 20)
    enved = (ranked
             .withColumn("env", F.max("prec").over(rev))
             .withColumn("env_q", F.floor(F.col("env") * q + 0.5) / q))
    ap_num = (enved.groupBy("category")
              .agg(F.sum(F.col("is_tp") * F.col("env_q")).alias("ap_num")))
    return (gts.join(ap_num, on="category", how="left")
            .select("category",
                    (F.coalesce("ap_num", F.lit(0.0))
                     / F.greatest(F.col("num_gts").cast("double"), F.lit(eps)))
                    .alias("ap")))
