"""Batched IoU matcher.

Re-implements reference paa_core/modeling/matcher.py:5-113 over padded GT
tensors: per-anchor argmax over GTs with low/high thresholds
(BELOW_LOW_THRESHOLD=-1, BETWEEN_THRESHOLDS=-2) and the
allow_low_quality_matches tie-recovery rule (for each GT, every anchor
achieving that GT's maximum IoU — including ties — is restored to its own
best-match GT).

Padded GT rows are handled by masking their IoU rows to -1 so they can
never win an argmax nor trigger recovery.
"""

from __future__ import annotations

import jax.numpy as jnp

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


def match_anchors(iou, gt_valid, high_threshold, low_threshold,
                  allow_low_quality_matches=True):
    """Args:
        iou: (B, G, N) match quality matrix.
        gt_valid: (B, G) bool — padded GT rows are False.
        high/low_threshold: floats, low <= high.

    Returns:
        matches: (B, N) int32 in [0, G) or {-1, -2}.
    """
    neg = jnp.asarray(-1.0, iou.dtype)
    iou = jnp.where(gt_valid[:, :, None], iou, neg)

    matched_vals = iou.max(axis=1)  # (B, N)
    all_matches = iou.argmax(axis=1).astype(jnp.int32)  # (B, N)

    matches = jnp.where(
        matched_vals >= high_threshold,
        all_matches,
        jnp.where(
            matched_vals >= low_threshold,
            jnp.int32(BETWEEN_THRESHOLDS),
            jnp.int32(BELOW_LOW_THRESHOLD),
        ),
    )

    if allow_low_quality_matches:
        highest_per_gt = iou.max(axis=2, keepdims=True)  # (B, G, 1)
        is_best_for_gt = (iou == highest_per_gt) & gt_valid[:, :, None]
        recover = is_best_for_gt.any(axis=1)  # (B, N)
        matches = jnp.where(recover, all_matches, matches)

    # images with zero valid GTs: everything is background
    any_gt = gt_valid.any(axis=1)[:, None]
    matches = jnp.where(any_gt, matches, jnp.int32(BELOW_LOW_THRESHOLD))
    return matches
