"""VOC eval tests: perfect detection mAP 1; difficult handling; 07-metric
quantization."""

import numpy as np

from paa_tpu.evaluation.voc_eval import calc_voc_ap, eval_detection_voc


def mk(boxes, labels, scores=None, difficult=None):
    d = dict(
        boxes=np.asarray(boxes, np.float64).reshape(-1, 4),
        labels=np.asarray(labels, np.int64),
    )
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float64)
    if difficult is not None:
        d["difficult"] = np.asarray(difficult, bool)
    else:
        d["difficult"] = np.zeros(len(d["labels"]), bool)
    return d


def test_perfect_detection():
    gts = [mk([[0, 0, 50, 50], [100, 100, 150, 150]], [1, 2])]
    preds = [
        mk([[0, 0, 50, 50], [100, 100, 150, 150]], [1, 2], [0.9, 0.8])
    ]
    r = eval_detection_voc(gts, preds, use_07_metric=True)
    np.testing.assert_allclose(r["map"], 1.0)


def test_false_positive_lowers_ap():
    gts = [mk([[0, 0, 50, 50]], [1])]
    preds = [
        mk([[200, 200, 220, 220], [0, 0, 50, 50]], [1, 1], [0.95, 0.9])
    ]
    r = eval_detection_voc(gts, preds, use_07_metric=False)
    # PR: (0, 0), then (0.5, 1.0) -> AP = 0.5
    np.testing.assert_allclose(r["ap"][1], 0.5)


def test_difficult_gt_ignored():
    gts = [mk([[0, 0, 50, 50]], [1], difficult=[True])]
    preds = [mk([[0, 0, 50, 50]], [1], [0.9])]
    r = eval_detection_voc(gts, preds, use_07_metric=True)
    # no non-difficult gt -> recall undefined -> nan map
    assert np.isnan(r["ap"][1])


def test_double_detection_counts_fp():
    gts = [mk([[0, 0, 50, 50]], [1])]
    preds = [
        mk([[0, 0, 50, 50], [1, 1, 51, 51]], [1, 1], [0.9, 0.8])
    ]
    r = eval_detection_voc(gts, preds, use_07_metric=False)
    # second detection of the same gt is a FP; AP = 1.0 (the TP comes
    # first by score)
    np.testing.assert_allclose(r["ap"][1], 1.0)


def test_07_metric_11pt():
    prec = [None, np.array([1.0, 0.5])]
    rec = [None, np.array([0.5, 0.5])]
    ap = calc_voc_ap(prec, rec, use_07_metric=True)
    # p=1.0 at recall thresholds 0.0-0.5 (6 points), 0 beyond
    np.testing.assert_allclose(ap[1], 6 / 11)
