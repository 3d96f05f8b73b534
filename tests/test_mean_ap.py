"""Distributed mean_ap vs the reference aggregator's numpy formula
(reference functions/vision.py:235 mean_ap)."""

from __future__ import annotations

import numpy as np
import pytest

from pixeltable_spark.functions.vision import (
    detection_pr_events,
    gt_class_counts,
    mean_ap,
)


def _ref_map(events_by_class, num_gts):
    """Straight port of the reference value() (vision.py:258-279) for the
    cross-check; events_by_class: {cls: [(score, is_tp), ...]}."""
    eps = np.finfo(np.float32).eps
    out = {}
    for cls, evs in events_by_class.items():
        scores = np.array([s for s, _ in evs])
        tp = np.array([t for _, t in evs])
        fp = 1 - tp
        idx = np.argsort(-scores, kind="stable")
        tp_c, fp_c = tp[idx].cumsum(), fp[idx].cumsum()
        prec = tp_c / np.maximum(tp_c + fp_c, eps)
        rec = tp_c / np.maximum(num_gts.get(cls, 0), eps)
        mrec = np.hstack((0, rec, 1))
        mpre = np.hstack((0, prec, 0))
        for i in range(mpre.shape[0] - 1, 0, -1):
            mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
        ind = np.where(mrec[1:] != mrec[:-1])[0]
        out[cls] = float(np.sum((mrec[ind + 1] - mrec[ind]) * mpre[ind + 1]))
    return out


def _detections_df(spark, rows):
    return spark.createDataFrame(
        rows, "image_id long, pred_boxes array<array<double>>, "
              "pred_labels array<long>, pred_scores array<double>, "
              "gt_boxes array<array<double>>, gt_labels array<long>")


class TestPrEvents:
    def test_greedy_matching(self, spark):
        a, b, far = [0., 0., 10., 10.], [20., 20., 30., 30.], [50., 50., 60., 60.]
        df = _detections_df(spark, [
            (1, [a, far, b], [0, 0, 1], [0.9, 0.8, 0.7], [a, b], [0, 1]),
        ])
        ev = {(r["category"], r["pred_idx"]): r["is_tp"]
              for r in detection_pr_events(df).collect()}
        assert ev == {(0, 0): 1, (0, 1): 0, (1, 2): 1}

    def test_gt_claimed_once(self, spark):
        a = [0., 0., 10., 10.]
        df = _detections_df(spark, [
            (1, [a, a], [0, 0], [0.9, 0.8], [a], [0]),
        ])
        evs = sorted((r["score"], r["is_tp"])
                     for r in detection_pr_events(df).collect())
        assert evs == [(0.8, 0), (0.9, 1)]  # second claim is an FP


class TestMeanAp:
    def test_hand_computed(self, spark):
        a, b, far = [0., 0., 10., 10.], [20., 20., 30., 30.], [50., 50., 60., 60.]
        df = _detections_df(spark, [
            (1, [a, far, b], [0, 0, 1], [0.9, 0.8, 0.7], [a, b], [0, 1]),
            # class 2 gt with no predictions -> ap 0
            (2, [], [], [], [[1., 1., 2., 2.]], [2]),
        ])
        ap = {r["category"]: r["ap"] for r in mean_ap(df).collect()}
        assert ap[0] == pytest.approx(1.0, abs=2e-6)
        assert ap[1] == pytest.approx(1.0, abs=2e-6)
        assert ap[2] == 0.0

    def test_matches_reference_formula(self, spark):
        rng = np.random.RandomState(7)
        rows = []
        for img in range(12):
            gtb, gtl, pb, pl, ps = [], [], [], [], []
            for k in range(rng.randint(1, 5)):
                x = float(100 * k)
                box = [x, 0., x + 10., 10.]
                cls = int(rng.randint(0, 3))
                gtb.append(box); gtl.append(cls)
                r = rng.rand()
                if r < 0.5:       # true positive: exact box
                    pb.append(box); pl.append(cls)
                elif r < 0.8:     # fp: disjoint box, same class
                    pb.append([x + 40., 40., x + 50., 50.]); pl.append(cls)
                if pb and len(ps) < len(pb):
                    ps.append(float(round(rng.rand(), 3)))
            rows.append((img, pb, pl, ps, gtb, gtl))
        df = _detections_df(spark, rows)
        got = {r["category"]: r["ap"] for r in mean_ap(df).collect()}

        events, gts = {}, {}
        for r in detection_pr_events(df).collect():
            events.setdefault(r["category"], []).append((r["score"], r["is_tp"]))
        for r in gt_class_counts(df).collect():
            gts[r["category"]] = r["num_gts"]
        exp = _ref_map(events, gts)
        for cls, num in gts.items():
            assert got[cls] == pytest.approx(exp.get(cls, 0.0), abs=2e-5), cls

    def test_no_python_after_events(self, spark):
        # the window/AP math must stay JVM-side; only the matching kernel
        # is a pandas stage
        df = _detections_df(spark, [(1, [], [], [], [[0., 0., 1., 1.]], [0])])
        plan = mean_ap(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 0
