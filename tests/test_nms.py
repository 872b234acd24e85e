"""NMS golden tests (fixture from Caffe2 UtilsNMSTest.TestNMS, same as the
reference tests/test_nms.py) plus class-aware ml_nms semantics checks."""

import numpy as np
import jax.numpy as jnp

from paa_tpu.ops.nms import nms

BOXES = np.array(
    [
        [10, 10, 50, 60],
        [11, 12, 48, 60],
        [8, 9, 40, 50],
        [100, 100, 150, 140],
        [99, 110, 155, 139],
    ],
    dtype=np.float32,
)
SCORES = np.array([0.5, 0.7, 0.6, 0.9, 0.8], dtype=np.float32)


def run_nms(boxes, scores, labels, thresh, class_aware, max_out=10):
    valid = jnp.ones(scores.shape[0], dtype=bool)
    idx, sc, keep_valid = nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        valid, thresh, max_out, class_aware=class_aware
    )
    idx = np.asarray(idx)
    keep_valid = np.asarray(keep_valid)
    return np.sort(idx[keep_valid])


def test_nms_caffe2_golden():
    labels = np.zeros(5, dtype=np.int32)
    cases = [
        (0.1, [1, 3]),
        (0.3, [1, 3]),
        (0.5, [1, 3]),
        (0.8, [1, 2, 3, 4]),
        (0.9, [0, 1, 2, 3, 4]),
    ]
    for thresh, expected in cases:
        kept = run_nms(BOXES, SCORES, labels, thresh, class_aware=False)
        np.testing.assert_array_equal(kept, expected)


def test_ml_nms_label_gating():
    # With distinct labels, nothing suppresses anything (ml_nms.cu:13-15).
    labels = np.arange(5, dtype=np.int32)
    kept = run_nms(BOXES, SCORES, labels, 0.1, class_aware=True)
    np.testing.assert_array_equal(kept, [0, 1, 2, 3, 4])

    # With equal labels, class-aware equals plain NMS.
    labels = np.zeros(5, dtype=np.int32)
    kept = run_nms(BOXES, SCORES, labels, 0.1, class_aware=True)
    np.testing.assert_array_equal(kept, [1, 3])


def test_nms_max_out_truncates_in_score_order():
    labels = np.zeros(5, dtype=np.int32)
    valid = jnp.ones(5, dtype=bool)
    idx, sc, keep_valid = nms(
        jnp.asarray(BOXES), jnp.asarray(SCORES), jnp.asarray(labels),
        valid, 0.9, max_out=3, class_aware=False
    )
    # Greedy picks in descending score order: 3 (0.9), 4 (0.8), 1 (0.7).
    np.testing.assert_array_equal(np.asarray(idx), [3, 4, 1])
    assert np.asarray(keep_valid).all()


def test_nms_invalid_candidates_skipped():
    labels = np.zeros(5, dtype=np.int32)
    valid = jnp.asarray([True, False, True, False, True])
    idx, sc, keep_valid = nms(
        jnp.asarray(BOXES), jnp.asarray(SCORES), jnp.asarray(labels),
        valid, 0.9, max_out=5, class_aware=False
    )
    idx = np.asarray(idx)
    keep_valid = np.asarray(keep_valid)
    assert set(idx[keep_valid]) == {0, 2, 4}
    assert keep_valid.sum() == 3
