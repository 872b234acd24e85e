"""Tests for the numpy COCOeval reimplementation: exactness on
hand-computable scenarios + protocol properties."""

import numpy as np

from paa_tpu.evaluation.coco_eval import COCOEvaluator, _bbox_iou_xywh


def make_gt(entries):
    """entries: list of (img_id, cat, xywh, iscrowd)."""
    gt = {}
    for img_id, cat, bbox, crowd in entries:
        gt.setdefault(img_id, []).append(
            dict(bbox=list(bbox), category_id=cat, iscrowd=crowd,
                 area=bbox[2] * bbox[3])
        )
    return gt


def test_iou_crowd_semantics():
    dts = [[0, 0, 10, 10]]
    gts = [[0, 0, 20, 20]]
    iou = _bbox_iou_xywh(dts, gts, [False])[0, 0]
    np.testing.assert_allclose(iou, 100 / 400)
    iof = _bbox_iou_xywh(dts, gts, [True])[0, 0]
    np.testing.assert_allclose(iof, 1.0)  # crowd: union = dt area


def test_perfect_detection_ap1():
    gt = make_gt([
        (1, 1, (10, 10, 50, 50), 0),
        (1, 2, (100, 100, 30, 40), 0),
        (2, 1, (5, 5, 20, 20), 0),
    ])
    dets = {
        1: dict(
            boxes_xywh=np.array([[10, 10, 50, 50], [100, 100, 30, 40]]),
            scores=np.array([0.9, 0.8]),
            category_ids=np.array([1, 2]),
        ),
        2: dict(
            boxes_xywh=np.array([[5, 5, 20, 20]]),
            scores=np.array([0.7]),
            category_ids=np.array([1]),
        ),
    }
    ev = COCOEvaluator(gt, cat_ids=[1, 2], image_ids=[1, 2])
    res = ev.evaluate(dets)
    np.testing.assert_allclose(res["AP"], 1.0)
    np.testing.assert_allclose(res["AP50"], 1.0)
    np.testing.assert_allclose(res["AR100"], 1.0)


def test_no_detections_ap0():
    gt = make_gt([(1, 1, (10, 10, 50, 50), 0)])
    ev = COCOEvaluator(gt, cat_ids=[1], image_ids=[1])
    res = ev.evaluate({})
    np.testing.assert_allclose(res["AP"], 0.0)


def test_iou_threshold_cutoff():
    # det overlaps gt with IoU ~0.6: counts at thr<=0.6, fails above
    gt = make_gt([(1, 1, (0, 0, 100, 100), 0)])
    # shifted box: inter 60*100, union 2*100*100-6000 => iou=6000/14000=0.428..
    # use a box with iou exactly ~0.6: w overlap 75: inter 7500,
    # union 12500 -> 0.6
    dets = {
        1: dict(
            boxes_xywh=np.array([[25, 0, 100, 100]]),
            scores=np.array([0.9]),
            category_ids=np.array([1]),
        )
    }
    ev = COCOEvaluator(gt, cat_ids=[1], image_ids=[1])
    res = ev.evaluate(dets)
    # matched at IoU thr 0.5 and 0.55 and 0.6; 10 thresholds →
    # AP = 3/10, AP50 = 1, AP75 = 0
    np.testing.assert_allclose(res["AP50"], 1.0)
    np.testing.assert_allclose(res["AP75"], 0.0)
    np.testing.assert_allclose(res["AP"], 0.3, atol=1e-6)


def test_false_positive_halves_precision():
    gt = make_gt([(1, 1, (0, 0, 50, 50), 0)])
    # high-scoring FP then a perfect TP: p/r curve: at rank1 p=0 r=0;
    # rank2 p=0.5 r=1.0 -> AP = 0.5
    dets = {
        1: dict(
            boxes_xywh=np.array([[200, 200, 10, 10], [0, 0, 50, 50]]),
            scores=np.array([0.95, 0.9]),
            category_ids=np.array([1, 1]),
        )
    }
    ev = COCOEvaluator(gt, cat_ids=[1], image_ids=[1])
    res = ev.evaluate(dets)
    np.testing.assert_allclose(res["AP50"], 0.5, atol=1e-6)


def test_crowd_gt_ignored_and_matchable_many_times():
    gt = make_gt([
        (1, 1, (0, 0, 100, 100), 1),  # crowd
        (1, 1, (200, 200, 50, 50), 0),
    ])
    # two dts inside the crowd region (both should be ignored, not FPs)
    # plus a TP on the real gt
    dets = {
        1: dict(
            boxes_xywh=np.array(
                [[0, 0, 30, 30], [50, 50, 30, 30], [200, 200, 50, 50]]
            ),
            scores=np.array([0.95, 0.9, 0.85]),
            category_ids=np.array([1, 1, 1]),
        )
    }
    ev = COCOEvaluator(gt, cat_ids=[1], image_ids=[1])
    res = ev.evaluate(dets)
    np.testing.assert_allclose(res["AP50"], 1.0)


def test_area_ranges():
    # a small gt (16x16=256 < 1024) and a large gt (200x200)
    gt = make_gt([
        (1, 1, (0, 0, 16, 16), 0),
        (1, 1, (300, 300, 200, 200), 0),
    ])
    dets = {
        1: dict(
            boxes_xywh=np.array([[0, 0, 16, 16]]),
            scores=np.array([0.9]),
            category_ids=np.array([1]),
        )
    }
    ev = COCOEvaluator(gt, cat_ids=[1], image_ids=[1])
    res = ev.evaluate(dets)
    np.testing.assert_allclose(res["APs"], 1.0)  # small: only small gt counts
    np.testing.assert_allclose(res["APl"], 0.0)  # large gt missed
    np.testing.assert_allclose(res["AP"], 0.5, atol=0.01)


def test_maxdets_ar():
    # 3 gts, 3 tps -> AR1 should reflect only the top-1 det
    gt = make_gt([
        (1, 1, (0, 0, 50, 50), 0),
        (1, 1, (100, 0, 50, 50), 0),
        (1, 1, (200, 0, 50, 50), 0),
    ])
    dets = {
        1: dict(
            boxes_xywh=np.array(
                [[0, 0, 50, 50], [100, 0, 50, 50], [200, 0, 50, 50]]
            ),
            scores=np.array([0.9, 0.8, 0.7]),
            category_ids=np.array([1, 1, 1]),
        )
    }
    ev = COCOEvaluator(gt, cat_ids=[1], image_ids=[1])
    res = ev.evaluate(dets)
    np.testing.assert_allclose(res["AR1"], 1 / 3, atol=1e-6)
    np.testing.assert_allclose(res["AR100"], 1.0)
