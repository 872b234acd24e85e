"""Segmentation mask structures (host side).

Re-designs reference paa_core/structures/segmentation_mask.py for static
shapes: instead of carrying polygon lists through the training graph
(PolygonInstance.crop/resize at loss time), each GT instance's polygons
are rasterized ONCE on host into a fixed-size bitmask in the GT box's
own frame ("box-normalized" masks, the standard TPU Mask R-CNN design).
Inside the jitted train step, per-roi 28x28 targets are produced from
these by pure ROIAlign-style crops (modeling/roi_mask_head.py) — no
host sync, no dynamic shapes.

Rasterization uses cv2.fillPoly (pycocotools' frPyObjects is not
available in this environment).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def polygons_to_bitmask(polygons: Sequence[Sequence[float]], height: int,
                        width: int) -> np.ndarray:
    """Rasterize COCO-style polygons ([x1, y1, x2, y2, ...] lists) into
    an (height, width) uint8 mask."""
    import cv2

    mask = np.zeros((height, width), dtype=np.uint8)
    pts = [
        np.asarray(p, dtype=np.float64).reshape(-1, 2).round().astype(
            np.int32
        )
        for p in polygons
        if len(p) >= 6
    ]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def box_normalized_mask(polygons, box_xyxy, mask_size=112) -> np.ndarray:
    """Rasterize an instance's polygons into the frame of its own box:
    an (mask_size, mask_size) uint8 grid covering box_xyxy (+1-pixel
    width convention)."""
    import cv2

    x1, y1, x2, y2 = box_xyxy
    w = max(x2 - x1 + 1.0, 1.0)
    h = max(y2 - y1 + 1.0, 1.0)
    mask = np.zeros((mask_size, mask_size), dtype=np.uint8)
    pts = []
    for p in polygons:
        if len(p) < 6:
            continue
        arr = np.asarray(p, dtype=np.float64).reshape(-1, 2)
        arr[:, 0] = (arr[:, 0] - x1) / w * mask_size
        arr[:, 1] = (arr[:, 1] - y1) / h * mask_size
        pts.append(arr.round().astype(np.int32))
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def rasterize_instances(polygons_per_instance, boxes_xyxy, max_gt,
                        mask_size=112) -> np.ndarray:
    """(max_gt, mask_size, mask_size) uint8 box-normalized GT masks."""
    out = np.zeros((max_gt, mask_size, mask_size), dtype=np.uint8)
    n = min(len(polygons_per_instance), max_gt)
    for i in range(n):
        out[i] = box_normalized_mask(
            polygons_per_instance[i], boxes_xyxy[i], mask_size
        )
    return out


def paste_mask_in_image(mask, box_xyxy, image_height, image_width,
                        threshold=0.5):
    """Paste a (M, M) float mask predicted in the box frame back into
    the full image (reference roi_heads/mask_head/inference.py
    Masker.paste semantics, simplified)."""
    import cv2

    x1, y1, x2, y2 = (int(round(v)) for v in box_xyxy)
    w = max(x2 - x1 + 1, 1)
    h = max(y2 - y1 + 1, 1)
    resized = cv2.resize(
        mask.astype(np.float32), (w, h),
        interpolation=cv2.INTER_LINEAR,
    )
    if threshold is not None:
        resized = (resized > threshold).astype(np.uint8)
    out = np.zeros((image_height, image_width), dtype=resized.dtype)
    xs1 = max(x1, 0)
    ys1 = max(y1, 0)
    xs2 = min(x2 + 1, image_width)
    ys2 = min(y2 + 1, image_height)
    out[ys1:ys2, xs1:xs2] = resized[
        ys1 - y1: ys2 - y1, xs1 - x1: xs2 - x1
    ]
    return out
