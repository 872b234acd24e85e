"""Focal loss vs the reference CPU spec
(paa_core/layers/sigmoid_focal_loss.py:40-52), replicated here in numpy."""

import numpy as np
import jax.numpy as jnp

from paa_tpu.ops.focal_loss import sigmoid_focal_loss


def reference_focal(logits, targets, gamma, alpha):
    num_classes = logits.shape[1]
    class_range = np.arange(1, num_classes + 1, dtype=np.float64)[None, :]
    t = targets[:, None].astype(np.float64)
    p = 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))
    term1 = (1 - p) ** gamma * np.log(p)
    term2 = p ** gamma * np.log(1 - p)
    return (
        -(t == class_range).astype(np.float64) * term1 * alpha
        - ((t != class_range) & (t >= 0)).astype(np.float64) * term2 * (1 - alpha)
    )


def test_matches_reference_cpu_spec():
    rng = np.random.RandomState(0)
    logits = rng.normal(0, 3, size=(64, 8)).astype(np.float32)
    targets = rng.randint(-1, 9, size=(64,)).astype(np.int32)
    ref = reference_focal(logits, targets, 2.0, 0.25)
    out = sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), 2.0, 0.25)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-5)


def test_ignore_targets_contribute_zero():
    logits = np.ones((4, 3), dtype=np.float32)
    targets = np.full((4,), -1, dtype=np.int32)
    out = sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), 2.0, 0.25)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_batched_shape():
    logits = np.zeros((2, 5, 3), dtype=np.float32)
    targets = np.zeros((2, 5), dtype=np.int32)
    out = sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), 2.0, 0.25)
    assert out.shape == (2, 5, 3)


def test_grad_is_finite():
    import jax

    def loss_fn(logits):
        t = jnp.asarray([1, 0, 2, -1])
        return sigmoid_focal_loss(logits, t, 2.0, 0.25).sum()

    g = jax.grad(loss_fn)(jnp.asarray(np.random.RandomState(0)
                                      .normal(size=(4, 3)).astype(np.float32)))
    assert np.isfinite(np.asarray(g)).all()
