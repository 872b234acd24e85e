"""TTA merge logic tests: bbox vote / soft vote / greedy NMS numpy
mirrors and the aug-list builder."""

import numpy as np

from paa_tpu.config import get_cfg
from paa_tpu.engine.bbox_aug import (
    bbox_vote,
    build_aug_list,
    np_greedy_ml_nms,
    soft_bbox_vote,
)


def test_bbox_vote_weighted_average():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [100, 100, 110, 110]], np.float64
    )
    scores = np.array([0.9, 0.6, 0.8])
    vb, vs = bbox_vote(boxes, scores, vote_thresh=0.5)
    # the two overlapping boxes merge (weighted by score); the far one
    # stays
    assert len(vs) == 2
    merged = (boxes[0] * 0.9 + boxes[1] * 0.6) / 1.5
    i = int(np.argmax(vs))  # merged keeps max score 0.9
    np.testing.assert_allclose(vb[i], merged, rtol=1e-6)
    np.testing.assert_allclose(sorted(vs), [0.8, 0.9])


def test_bbox_vote_single_box_passthrough():
    boxes = np.array([[0, 0, 10, 10]], np.float64)
    vb, vs = bbox_vote(boxes, np.array([0.9]), 0.5)
    assert len(vs) == 0  # reference returns empty for <=1 input


def test_soft_vote_keeps_decayed_survivors():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float64)
    scores = np.array([0.9, 0.8])
    vb, vs = soft_bbox_vote(boxes, scores, 0.5, score_thresh=0.05)
    # identical boxes: iou 1 -> decayed scores 0 -> below thresh;
    # only the merged box remains
    assert len(vs) == 1
    np.testing.assert_allclose(vs[0], 0.9)


def test_greedy_ml_nms_matches_classwise():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 10, 10]], np.float64
    )
    scores = np.array([0.9, 0.8, 0.7])
    labels = np.array([1, 1, 2])
    keep = np_greedy_ml_nms(boxes, scores, labels, 0.5, 10)
    # box1 suppressed by box0 (same class); box2 survives (class 2)
    assert set(keep) == {0, 2}


def test_aug_list_builder():
    cfg = get_cfg()
    cfg.TEST.BBOX_AUG.H_FLIP = True
    cfg.TEST.BBOX_AUG.SCALES = (400, 1200)
    cfg.TEST.BBOX_AUG.SCALE_H_FLIP = True
    cfg.TEST.BBOX_AUG.SCALE_RANGES = ((96, 10000), (0, 256))
    cfg.TEST.BBOX_AUG.MAX_SIZE = 2000
    augs = build_aug_list(cfg)
    # identity + hflip + 2 scales x 2 flips
    assert len(augs) == 6
    assert augs[0] == (800, 1333, False, None)
    assert augs[1] == (800, 1333, True, None)
    # scale < 800 keeps INPUT.MAX_SIZE_TEST
    assert augs[2] == (400, 1333, False, (96, 10000))
    assert augs[4][0] == 1200 and augs[4][1] == 2000
