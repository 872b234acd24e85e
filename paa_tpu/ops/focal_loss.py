"""Sigmoid focal loss.

Replaces the reference CUDA kernel ``_C.sigmoid_focalloss_forward/backward``
(paa_core/csrc/cuda/SigmoidFocalLoss_cuda.cu:20-57). The pure-torch CPU
fallback (paa_core/layers/sigmoid_focal_loss.py:40-52) is the numerical
spec:

    class_range = [1..C]
    p = sigmoid(logits)
    loss = -(t == class_range) * (1-p)^g * log(p) * a
           -((t != class_range) & (t >= 0)) * p^g * log(1-p) * (1-a)

Target encoding: integer class in [1..C] for positives, 0 for negatives,
<0 for ignore. On TPU this is a plain fused elementwise formula — XLA fuses
it into one VPU pass; a Pallas kernel buys nothing — so it is written with
numerically-stable log-sigmoids and differentiates for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits, targets, gamma, alpha):
    """Elementwise focal loss.

    Args:
        logits: (..., N, C) float.
        targets: (..., N) int — 0 bg, 1..C fg, <0 ignore.
    Returns:
        (..., N, C) float losses.
    """
    num_classes = logits.shape[-1]
    class_range = jnp.arange(1, num_classes + 1, dtype=targets.dtype)
    t = targets[..., None]
    p = jax.nn.sigmoid(logits)
    # log(p) = log_sigmoid(x); log(1-p) = log_sigmoid(-x)
    log_p = jax.nn.log_sigmoid(logits)
    log_1mp = jax.nn.log_sigmoid(-logits)
    pos_term = ((1 - p) ** gamma) * log_p
    neg_term = (p ** gamma) * log_1mp
    is_pos = (t == class_range).astype(logits.dtype)
    is_neg = ((t != class_range) & (t >= 0)).astype(logits.dtype)
    return -is_pos * pos_term * alpha - is_neg * neg_term * (1 - alpha)
