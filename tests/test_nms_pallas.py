"""Pallas fused NMS: exact equivalence with the XLA scan formulation
(interpret mode on the CPU test platform; compiled on TPU)."""

import numpy as np
import jax.numpy as jnp

from paa_tpu.ops.nms import nms
from paa_tpu.ops.nms_pallas import nms_pallas


def random_case(seed, n=300, n_labels=5):
    rng = np.random.RandomState(seed)
    boxes = rng.uniform(0, 200, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 80, (n, 2))
    scores = rng.uniform(0, 1, n).astype(np.float32)
    labels = rng.randint(0, n_labels, n).astype(np.int32)
    valid = rng.rand(n) > 0.2
    return boxes, scores, labels, valid


def test_pallas_matches_scan_nms():
    for seed in range(4):
        boxes, scores, labels, valid = random_case(seed)
        for class_aware in (True, False):
            a = nms(
                jnp.asarray(boxes), jnp.asarray(scores),
                jnp.asarray(labels), jnp.asarray(valid), 0.5, 64,
                class_aware=class_aware,
            )
            b = nms_pallas(
                jnp.asarray(boxes), jnp.asarray(scores),
                jnp.asarray(labels), jnp.asarray(valid), 0.5, 64,
                class_aware=class_aware,
            )
            np.testing.assert_array_equal(np.asarray(a[2]),
                                          np.asarray(b[2]))
            ka = np.asarray(a[0])[np.asarray(a[2])]
            kb = np.asarray(b[0])[np.asarray(b[2])]
            np.testing.assert_array_equal(ka, kb)
            np.testing.assert_allclose(
                np.asarray(a[1])[np.asarray(a[2])],
                np.asarray(b[1])[np.asarray(b[2])],
                rtol=1e-6,
            )


def test_pallas_golden_caffe2():
    boxes = np.array(
        [
            [10, 10, 50, 60],
            [11, 12, 48, 60],
            [8, 9, 40, 50],
            [100, 100, 150, 140],
            [99, 110, 155, 139],
        ],
        dtype=np.float32,
    )
    scores = np.array([0.5, 0.7, 0.6, 0.9, 0.8], dtype=np.float32)
    labels = np.zeros(5, np.int32)
    valid = np.ones(5, bool)
    idx, sc, kv = nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        jnp.asarray(valid), 0.5, 8, class_aware=False,
    )
    kept = np.sort(np.asarray(idx)[np.asarray(kv)])
    np.testing.assert_array_equal(kept, [1, 3])


def test_pallas_batched_matches_vmap_scan():
    """nms_pallas_batched == vmap(scan nms) exactly, including rows that
    are fully invalid and batch sizes off the sublane multiple."""
    import jax

    from paa_tpu.ops.nms_pallas import nms_pallas_batched

    for bsz in (1, 3, 8):
        cases = [random_case(100 + 7 * bsz + i) for i in range(bsz)]
        boxes = jnp.asarray(np.stack([c[0] for c in cases]))
        scores = jnp.asarray(np.stack([c[1] for c in cases]))
        labels = jnp.asarray(np.stack([c[2] for c in cases]))
        valid = np.stack([c[3] for c in cases])
        if bsz > 1:
            valid[-1] = False  # an exhausted image
        valid = jnp.asarray(valid)
        for class_aware in (True, False):
            ref = jax.vmap(
                lambda b, s, l, v: nms(
                    b, s, l, v, 0.5, 64, class_aware=class_aware
                )
            )(boxes, scores, labels, valid)
            got = nms_pallas_batched(
                boxes, scores, labels, valid, 0.5, 64,
                class_aware=class_aware,
            )
            np.testing.assert_array_equal(
                np.asarray(ref[2]), np.asarray(got[2])
            )
            kv = np.asarray(ref[2])
            np.testing.assert_array_equal(
                np.asarray(ref[0])[kv], np.asarray(got[0])[kv]
            )
            np.testing.assert_allclose(
                np.asarray(ref[1])[kv], np.asarray(got[1])[kv],
                rtol=1e-6,
            )


def test_nms_batched_auto_dispatch():
    """nms_batched_auto on the CPU test platform (scan path) matches
    per-image nms_auto."""
    from paa_tpu.ops.nms import nms_batched_auto

    cases = [random_case(7), random_case(8)]
    boxes = jnp.asarray(np.stack([c[0] for c in cases]))
    scores = jnp.asarray(np.stack([c[1] for c in cases]))
    labels = jnp.asarray(np.stack([c[2] for c in cases]))
    valid = jnp.asarray(np.stack([c[3] for c in cases]))
    got = nms_batched_auto(boxes, scores, labels, valid, 0.6, 32)
    for i in range(2):
        ref = nms(boxes[i], scores[i], labels[i], valid[i], 0.6, 32)
        np.testing.assert_array_equal(
            np.asarray(ref[2]), np.asarray(got[2][i])
        )
        kv = np.asarray(ref[2])
        np.testing.assert_array_equal(
            np.asarray(ref[0])[kv], np.asarray(got[0][i])[kv]
        )
