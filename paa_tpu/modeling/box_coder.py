"""Box encode/decode for the ATSS/PAA heads.

Re-implements the shared ``BoxCoder`` (reference
paa_core/modeling/rpn/atss/atss.py:14-97) as pure batched functions:
'BOX' mode = Faster-RCNN deltas with weights (10, 10, 5, 5) and exp clamp,
'POINT' mode = FCOS-style l/t/r/b distances scaled by
ANCHOR_SIZES[0]/ANCHOR_STRIDES[0].

All functions take ``(..., 4)`` arrays and broadcast over leading dims.
"""

from __future__ import annotations

import math
from functools import partial

import jax.numpy as jnp

BBOX_XFORM_CLIP = math.log(1000.0 / 16)
_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
TO_REMOVE = 1.0


def encode_box(gt_boxes, anchors, weights=_WEIGHTS):
    """'BOX' regression targets (atss.py:33-52)."""
    ex_w = anchors[..., 2] - anchors[..., 0] + TO_REMOVE
    ex_h = anchors[..., 3] - anchors[..., 1] + TO_REMOVE
    ex_cx = (anchors[..., 2] + anchors[..., 0]) / 2
    ex_cy = (anchors[..., 3] + anchors[..., 1]) / 2

    gt_w = gt_boxes[..., 2] - gt_boxes[..., 0] + TO_REMOVE
    gt_h = gt_boxes[..., 3] - gt_boxes[..., 1] + TO_REMOVE
    gt_cx = (gt_boxes[..., 2] + gt_boxes[..., 0]) / 2
    gt_cy = (gt_boxes[..., 3] + gt_boxes[..., 1]) / 2

    wx, wy, ww, wh = weights
    dx = wx * (gt_cx - ex_cx) / ex_w
    dy = wy * (gt_cy - ex_cy) / ex_h
    dw = ww * jnp.log(gt_w / ex_w)
    dh = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_box(preds, anchors, weights=_WEIGHTS):
    """'BOX' decode (atss.py:68-97). Also covers the generic Faster-RCNN
    coder (reference paa_core/modeling/box_coder.py) via ``weights``."""
    anchors = anchors.astype(preds.dtype)
    w = anchors[..., 2] - anchors[..., 0] + TO_REMOVE
    h = anchors[..., 3] - anchors[..., 1] + TO_REMOVE
    cx = (anchors[..., 2] + anchors[..., 0]) / 2
    cy = (anchors[..., 3] + anchors[..., 1]) / 2

    wx, wy, ww, wh = weights
    dx = preds[..., 0] / wx
    dy = preds[..., 1] / wy
    dw = jnp.clip(preds[..., 2] / ww, None, BBOX_XFORM_CLIP)
    dh = jnp.clip(preds[..., 3] / wh, None, BBOX_XFORM_CLIP)

    pred_cx = dx * w + cx
    pred_cy = dy * h + cy
    pred_w = jnp.exp(dw) * w
    pred_h = jnp.exp(dh) * h

    return jnp.stack(
        [
            pred_cx - 0.5 * (pred_w - 1),
            pred_cy - 0.5 * (pred_h - 1),
            pred_cx + 0.5 * (pred_w - 1),
            pred_cy + 0.5 * (pred_h - 1),
        ],
        axis=-1,
    )


def encode_point(gt_boxes, anchors, scale):
    """'POINT' regression targets (atss.py:20-32). ``scale`` =
    ANCHOR_SIZES[0] / ANCHOR_STRIDES[0]."""
    aw = anchors[..., 2] - anchors[..., 0] + TO_REMOVE
    ah = anchors[..., 3] - anchors[..., 1] + TO_REMOVE
    acx = (anchors[..., 2] + anchors[..., 0]) / 2
    acy = (anchors[..., 3] + anchors[..., 1]) / 2

    l = scale * (acx - gt_boxes[..., 0]) / aw
    t = scale * (acy - gt_boxes[..., 1]) / ah
    r = scale * (gt_boxes[..., 2] - acx) / aw
    b = scale * (gt_boxes[..., 3] - acy) / ah
    return jnp.stack([l, t, r, b], axis=-1)


def decode_point(preds, anchors, scale):
    """'POINT' decode (atss.py:55-67)."""
    aw = anchors[..., 2] - anchors[..., 0] + TO_REMOVE
    ah = anchors[..., 3] - anchors[..., 1] + TO_REMOVE
    acx = (anchors[..., 2] + anchors[..., 0]) / 2
    acy = (anchors[..., 3] + anchors[..., 1]) / 2

    x1 = acx - preds[..., 0] / scale * aw
    y1 = acy - preds[..., 1] / scale * ah
    x2 = acx + preds[..., 2] / scale * aw
    y2 = acy + preds[..., 3] / scale * ah
    return jnp.stack([x1, y1, x2, y2], axis=-1)


class BoxCoder:
    """Config-driven coder matching the reference class's interface."""

    def __init__(self, cfg):
        self.regression_type = cfg.MODEL.ATSS.REGRESSION_TYPE
        self.point_scale = (
            cfg.MODEL.ATSS.ANCHOR_SIZES[0] / cfg.MODEL.ATSS.ANCHOR_STRIDES[0]
        )

    def encode(self, gt_boxes, anchors):
        if self.regression_type == "POINT":
            return encode_point(gt_boxes, anchors, self.point_scale)
        elif self.regression_type == "BOX":
            return encode_box(gt_boxes, anchors)
        raise NotImplementedError(self.regression_type)

    def decode(self, preds, anchors):
        if self.regression_type == "POINT":
            return decode_point(preds, anchors, self.point_scale)
        elif self.regression_type == "BOX":
            return decode_box(preds, anchors)
        raise NotImplementedError(self.regression_type)
