"""RLE mask utilities + segm-flavor COCO evaluation.

Validates evaluation/mask_rle.py against brute-force bitmask computation
and the segm evaluator on a hand-checked fixture (the reference uses
pycocotools mask RLE, paa_core/.../coco_eval.py:13-67)."""

import numpy as np

from paa_tpu.evaluation import mask_rle
from paa_tpu.evaluation.coco_eval import COCOEvaluator


def random_mask(rng, h, w, p=0.3):
    # blobby masks: threshold a blurred random field
    import cv2

    field = rng.rand(h, w).astype(np.float32)
    field = cv2.blur(field, (7, 7))
    return (field > np.quantile(field, 1 - p)).astype(np.uint8)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    for h, w in [(1, 1), (5, 3), (17, 31), (64, 48)]:
        m = (rng.rand(h, w) > 0.5).astype(np.uint8)
        rle = mask_rle.encode(m)
        np.testing.assert_array_equal(mask_rle.decode(rle), m)
        assert mask_rle.area(rle) == int(m.sum())
    # all-zeros / all-ones
    z = np.zeros((4, 4), np.uint8)
    np.testing.assert_array_equal(mask_rle.decode(mask_rle.encode(z)), z)
    o = np.ones((4, 4), np.uint8)
    np.testing.assert_array_equal(mask_rle.decode(mask_rle.encode(o)), o)
    assert mask_rle.encode(o)["counts"][0] == 0  # leading zero-run


def test_iou_matches_bitmask_bruteforce():
    rng = np.random.RandomState(1)
    h, w = 40, 56
    dts = [random_mask(rng, h, w) for _ in range(4)]
    gts = [random_mask(rng, h, w) for _ in range(3)]
    crowd = [False, True, False]

    got = mask_rle.iou(
        [mask_rle.encode(m) for m in dts],
        [mask_rle.encode(m) for m in gts],
        crowd,
    )
    for i, d in enumerate(dts):
        for j, g in enumerate(gts):
            inter = np.logical_and(d, g).sum()
            union = d.sum() if crowd[j] else d.sum() + g.sum() - inter
            want = inter / union if union else 0.0
            np.testing.assert_allclose(got[i, j], want, rtol=1e-12)


def test_polygons_to_rle_square():
    rle = mask_rle.polygons_to_rle(
        [[2, 2, 8, 2, 8, 8, 2, 8]], 12, 12
    )
    m = mask_rle.decode(rle)
    assert m[3:8, 3:8].all()  # interior filled
    assert m.sum() <= 7 * 7 + 14  # roughly the square


def test_segm_evaluator_perfect_and_shifted():
    h, w = 32, 32
    gt_poly = [[4, 4, 20, 4, 20, 20, 4, 20]]
    gt = {
        1: [
            dict(
                bbox=[4, 4, 16, 16], area=256, category_id=1, iscrowd=0,
                segmentation=gt_poly,
            )
        ]
    }
    gt_mask = mask_rle.decode(mask_rle.polygons_to_rle(gt_poly, h, w))

    perfect = {
        1: dict(
            boxes_xywh=np.array([[4.0, 4, 16, 16]]),
            scores=np.array([0.9]),
            category_ids=np.array([1]),
            masks_rle=[mask_rle.encode(gt_mask)],
        )
    }
    ev = COCOEvaluator(
        gt, [1], [1], iou_type="segm", image_sizes={1: (h, w)}
    )
    res = ev.evaluate(perfect)
    assert res["AP"] == 1.0 and res["AP75"] == 1.0

    # a mask shifted far enough to land between IoU 0.5 and 0.75:
    # matching at low thresholds only -> 0 < AP < 1
    shifted = np.zeros_like(gt_mask)
    shifted[4:21, 8:25] = 1
    halfish = {
        1: dict(
            boxes_xywh=np.array([[8.0, 4, 16, 16]]),
            scores=np.array([0.9]),
            category_ids=np.array([1]),
            masks_rle=[mask_rle.encode(shifted)],
        )
    }
    res = ev.evaluate(halfish)
    assert res["AP50"] == 1.0
    assert res["AP75"] == 0.0
    assert 0.0 < res["AP"] < 1.0
