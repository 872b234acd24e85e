"""Batched, fixed-shape box operations.

The reference's ``BoxList`` (paa_core/structures/bounding_box.py:9) is a
dynamic per-image container; on TPU we instead keep plain arrays
``(..., N, 4)`` in xyxy mode plus parallel validity / label / score arrays,
so everything stays static-shape and jit-friendly.

All IoU/area math follows the reference's legacy Detectron "+1 pixel"
convention (paa_core/structures/boxlist_ops.py:110-112,
paa_core/modeling/rpn/paa/loss.py:258-265, csrc/cuda/ml_nms.cu:17-23):
``w = x2 - x1 + 1``.
"""

from __future__ import annotations

import jax.numpy as jnp

TO_REMOVE = 1.0  # legacy Detectron +1-pixel box-size convention


def box_area(boxes):
    """Area under the +1 convention. boxes: (..., 4) xyxy."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return w * h


def box_iou(boxes1, boxes2):
    """Pairwise IoU with the +1 convention.

    boxes1: (..., N, 4), boxes2: (..., M, 4) -> (..., N, M).
    Matches reference boxlist_iou (structures/boxlist_ops.py:94-116).
    """
    area1 = box_area(boxes1)  # (..., N)
    area2 = box_area(boxes2)  # (..., M)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / union


def box_iou_aligned(boxes1, boxes2):
    """Elementwise IoU of aligned box arrays (..., 4) under the +1 convention.

    Matches reference PAALossComputation.compute_ious
    (paa_core/modeling/rpn/paa/loss.py:258-265).
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area1 + area2 - inter)


def clip_to_image(boxes, image_size):
    """Clip xyxy boxes to [0, size-1] like BoxList.clip_to_image
    (structures/bounding_box.py:215-224).

    boxes: (..., N, 4); image_size: (..., 2) as (height, width) —
    broadcast against the box batch dims.
    """
    h = image_size[..., 0:1]
    w = image_size[..., 1:2]
    x1 = jnp.clip(boxes[..., 0], 0.0, w - TO_REMOVE)
    y1 = jnp.clip(boxes[..., 1], 0.0, h - TO_REMOVE)
    x2 = jnp.clip(boxes[..., 2], 0.0, w - TO_REMOVE)
    y2 = jnp.clip(boxes[..., 3], 0.0, h - TO_REMOVE)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def xyxy_to_xywh(boxes):
    """xyxy -> xywh under the +1 convention (BoxList.convert,
    structures/bounding_box.py:73-86)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [x1, y1, x2 - x1 + TO_REMOVE, y2 - y1 + TO_REMOVE], axis=-1
    )


def xywh_to_xyxy(boxes):
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [x, y, x + jnp.clip(w - TO_REMOVE, 0.0), y + jnp.clip(h - TO_REMOVE, 0.0)],
        axis=-1,
    )
