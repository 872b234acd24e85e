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


def _mirror_vote(boxes, scores, vote_thresh, soft=False, score_thresh=0.0):
    """Straight transcription of reference bbox_aug_vote.py:203-310 as the
    test oracle for the vectorized implementations."""
    det = np.concatenate(
        [boxes, scores.reshape(-1, 1)], axis=1
    ).astype(np.float64)
    if det.shape[0] <= 1:
        return np.zeros((0, 4)), np.zeros((0,))
    det = det[det[:, 4].argsort()[::-1]]
    dets = []
    while det.shape[0] > 0:
        area = (det[:, 2] - det[:, 0] + 1) * (det[:, 3] - det[:, 1] + 1)
        xx1 = np.maximum(det[0, 0], det[:, 0])
        yy1 = np.maximum(det[0, 1], det[:, 1])
        xx2 = np.minimum(det[0, 2], det[:, 2])
        yy2 = np.minimum(det[0, 3], det[:, 3])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        o = (w * h) / (area[0] + area - w * h)
        merge_index = np.where(o >= vote_thresh)[0]
        det_accu = det[merge_index]
        accu_iou = o[merge_index]
        det = np.delete(det, merge_index, 0)
        if merge_index.shape[0] <= 1:
            dets.append(det_accu)
            continue
        merged = np.zeros((1, 5))
        merged[0, :4] = (det_accu[:, :4] * det_accu[:, 4:5]).sum(0) \
            / det_accu[:, 4].sum()
        merged[0, 4] = det_accu[:, 4].max()
        if soft:
            decayed = det_accu.copy()
            decayed[:, 4] = decayed[:, 4] * (1 - accu_iou)
            decayed = decayed[decayed[:, 4] >= score_thresh]
            if decayed.shape[0] > 0:
                merged = np.concatenate([merged, decayed], axis=0)
        dets.append(merged)
    dets = np.concatenate(dets, axis=0)
    if soft:
        dets = dets[dets[:, 4].argsort()[::-1]]
    return dets[:, :4], dets[:, 4]


def test_vote_fuzz_matches_reference_mirror():
    rng = np.random.RandomState(5)
    for trial in range(30):
        n = rng.randint(2, 40)
        x1 = rng.uniform(0, 80, n)
        y1 = rng.uniform(0, 80, n)
        boxes = np.stack(
            [x1, y1, x1 + rng.uniform(5, 60, n), y1 + rng.uniform(5, 60, n)],
            axis=1,
        ).astype(np.float32)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        th = rng.choice([0.3, 0.5, 0.66, 0.9])

        vb, vs = bbox_vote(boxes, scores, th)
        mb, ms = _mirror_vote(boxes, scores, th)
        np.testing.assert_allclose(vb, mb, rtol=1e-10, atol=1e-10,
                                   err_msg=f"bbox_vote trial {trial}")
        np.testing.assert_allclose(vs, ms, rtol=1e-10, atol=1e-10)

        st = rng.choice([0.0, 0.05, 0.3])
        vb, vs = soft_bbox_vote(boxes, scores, th, st)
        mb, ms = _mirror_vote(boxes, scores, th, soft=True, score_thresh=st)

        # equal scores (e.g. seeds decayed to exactly 0 when
        # score_thresh=0) sort in arbitrary relative order on both
        # sides; compare under a canonical lexicographic order instead
        def canon(b, s):
            key = np.lexsort((b[:, 3], b[:, 2], b[:, 1], b[:, 0], -s))
            return b[key], s[key]

        vb, vs = canon(vb, vs)
        mb, ms = canon(mb, ms)
        np.testing.assert_allclose(vb, mb, rtol=1e-10, atol=1e-10,
                                   err_msg=f"soft_bbox_vote trial {trial}")
        np.testing.assert_allclose(vs, ms, rtol=1e-10, atol=1e-10)
