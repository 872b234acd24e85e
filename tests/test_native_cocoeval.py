"""Native C++ COCOeval kernels: build + exact agreement with the numpy
fallback on randomized scenarios."""

import numpy as np
import pytest

from paa_tpu.evaluation import _native
from paa_tpu.evaluation.coco_eval import (
    IOU_THRS,
    _bbox_iou_xywh,
    _match_img_py,
)


@pytest.fixture(scope="module")
def native():
    assert _native.available(), "native cocoeval failed to build"
    return _native


def test_native_iou_matches_numpy(native):
    rng = np.random.RandomState(0)
    dts = np.abs(rng.normal(50, 20, (17, 4)))
    gts = np.abs(rng.normal(50, 20, (9, 4)))
    crowd = rng.rand(9) > 0.7
    ref = np.zeros((17, 9))
    # numpy formula (replicating the python fallback body)
    for j in range(9):
        gx, gy, gw, gh = gts[j]
        ga = gw * gh
        x1 = np.maximum(dts[:, 0], gx)
        y1 = np.maximum(dts[:, 1], gy)
        x2 = np.minimum(dts[:, 0] + dts[:, 2], gx + gw)
        y2 = np.minimum(dts[:, 1] + dts[:, 3], gy + gh)
        iw = np.clip(x2 - x1, 0, None)
        ih = np.clip(y2 - y1, 0, None)
        inter = iw * ih
        da = dts[:, 2] * dts[:, 3]
        union = da if crowd[j] else da + ga - inter
        ref[:, j] = inter / np.maximum(union, 1e-12)
    out = native.bbox_iou_xywh(dts, gts, crowd)
    np.testing.assert_allclose(out, ref, rtol=1e-12)


def test_native_matching_agrees_with_python(native):
    rng = np.random.RandomState(1)
    for trial in range(20):
        n_dt = rng.randint(0, 30)
        n_gt = rng.randint(0, 15)
        ious = rng.rand(n_dt, n_gt)
        g_ig = rng.rand(n_gt) > 0.6
        g_crowd = g_ig & (rng.rand(n_gt) > 0.5)
        oor = rng.rand(n_dt) > 0.8
        # sort gts: non-ignored first (as the evaluator does)
        order = np.argsort(g_ig, kind="mergesort")
        ious = ious[:, order]
        g_ig = g_ig[order]
        g_crowd = g_crowd[order]

        dtm_c, dtig_c = native.evaluate_img(
            ious, g_ig, g_crowd, oor, IOU_THRS
        )
        dtm_p, dtig_p = _match_img_py(ious, g_ig, g_crowd, oor)
        np.testing.assert_array_equal(dtm_c, dtm_p)
        np.testing.assert_array_equal(dtig_c, dtig_p)


def test_full_evaluator_unchanged_with_native(native):
    # the end-to-end evaluator results must be identical whichever
    # backend runs (sanity: rerun one scenario from test_coco_eval)
    from paa_tpu.evaluation.coco_eval import COCOEvaluator

    gt = {
        1: [
            dict(bbox=[0, 0, 100, 100], category_id=1, iscrowd=1,
                 area=10000),
            dict(bbox=[200, 200, 50, 50], category_id=1, iscrowd=0,
                 area=2500),
        ]
    }
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
