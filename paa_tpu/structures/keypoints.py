"""Person keypoints as fixed-shape arrays.

Replaces the reference's PersonKeypoints container
(paa_core/structures/keypoint.py:1-188) with plain (G, K, 3) float
arrays (x, y, visibility) padded to MAX_GT, plus the pure functions the
pipeline needs: resize, horizontal flip (with the left/right swap map),
and the keypoint->heatmap projection used by the ROI keypoint loss
(keypoint.py keypoints_to_heat_map, a direct C2 translation there).
"""

from __future__ import annotations

import numpy as np

PERSON_KEYPOINT_NAMES = (
    "nose",
    "left_eye", "right_eye",
    "left_ear", "right_ear",
    "left_shoulder", "right_shoulder",
    "left_elbow", "right_elbow",
    "left_wrist", "right_wrist",
    "left_hip", "right_hip",
    "left_knee", "right_knee",
    "left_ankle", "right_ankle",
)

_FLIP_MAP = {
    "left_eye": "right_eye",
    "left_ear": "right_ear",
    "left_shoulder": "right_shoulder",
    "left_elbow": "right_elbow",
    "left_wrist": "right_wrist",
    "left_hip": "right_hip",
    "left_knee": "right_knee",
    "left_ankle": "right_ankle",
}


def _flip_indices():
    full = dict(_FLIP_MAP)
    full.update({v: k for k, v in _FLIP_MAP.items()})
    names = list(PERSON_KEYPOINT_NAMES)
    return np.asarray(
        [names.index(full.get(n, n)) for n in names], dtype=np.int64
    )


FLIP_INDS = _flip_indices()

# COCO OKS per-keypoint sigmas (pycocotools cocoeval.py)
OKS_SIGMAS = np.asarray(
    [
        0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
        0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089,
    ],
    dtype=np.float64,
)

CONNECTIONS = (
    (1, 2), (1, 0), (2, 0), (2, 4), (1, 3),
    (6, 8), (8, 10), (5, 7), (7, 9),
    (12, 14), (14, 16), (11, 13), (13, 15),
    (6, 5), (12, 11),
)


def resize_keypoints(kps: np.ndarray, ratio_w: float,
                     ratio_h: float) -> np.ndarray:
    """Scale (G, K, 3) keypoint coordinates (keypoint.py resize)."""
    out = np.asarray(kps, dtype=np.float32).copy()
    out[..., 0] *= ratio_w
    out[..., 1] *= ratio_h
    return out


def flip_keypoints(kps: np.ndarray, width: int) -> np.ndarray:
    """Horizontal flip with the left<->right swap and the COCO
    convention that invisible keypoints zero out (keypoint.py
    transpose, +1 pixel convention)."""
    out = np.asarray(kps, dtype=np.float32)[:, FLIP_INDS].copy()
    out[..., 0] = width - out[..., 0] - 1.0
    out[out[..., 2] == 0] = 0.0
    return out


def keypoints_to_heatmap(kps, rois, heatmap_size: int):
    """Project keypoints into per-roi heatmap bins (jnp-friendly).

    kps: (R, K, 3); rois: (R, 4) xyxy. Returns (lin_index (R, K) int32,
    valid (R, K) int32) exactly matching the reference
    keypoints_to_heat_map (keypoint.py:154-188): floor projection,
    boundary snap to the last bin, validity = in-range AND visible.
    """
    import jax.numpy as jnp

    offset_x = rois[:, 0:1]
    offset_y = rois[:, 1:2]
    scale_x = heatmap_size / (rois[:, 2:3] - rois[:, 0:1])
    scale_y = heatmap_size / (rois[:, 3:4] - rois[:, 1:2])

    x = kps[..., 0]
    y = kps[..., 1]
    x_boundary = x == rois[:, 2:3]
    y_boundary = y == rois[:, 3:4]

    xi = jnp.floor((x - offset_x) * scale_x).astype(jnp.int32)
    yi = jnp.floor((y - offset_y) * scale_y).astype(jnp.int32)
    xi = jnp.where(x_boundary, heatmap_size - 1, xi)
    yi = jnp.where(y_boundary, heatmap_size - 1, yi)

    valid_loc = (
        (xi >= 0) & (yi >= 0) & (xi < heatmap_size) & (yi < heatmap_size)
    )
    vis = kps[..., 2] > 0
    valid = (valid_loc & vis).astype(jnp.int32)
    lin = (yi * heatmap_size + xi) * valid
    return lin, valid


def heatmaps_to_keypoints(maps: np.ndarray, rois: np.ndarray) -> np.ndarray:
    """Heatmaps -> (R, K, 3) keypoint (x, y, score) on host.

    Mirrors the reference inference.py heatmaps_to_keypoints: resize the
    (56, 56, K) map to the roi's pixel size with cubic interpolation,
    argmax per keypoint, Heckbert +0.5 continuous coords, softmax prob
    as the score.
    """
    import cv2

    r, _, _, k = maps.shape
    out = np.zeros((r, k, 3), dtype=np.float32)
    widths = np.maximum(rois[:, 2] - rois[:, 0], 1)
    heights = np.maximum(rois[:, 3] - rois[:, 1], 1)
    for i in range(r):
        w = int(np.ceil(widths[i]))
        h = int(np.ceil(heights[i]))
        m = cv2.resize(maps[i], (w, h), interpolation=cv2.INTER_CUBIC)
        if m.ndim == 2:
            m = m[:, :, None]
        flat = m.reshape(-1, k)
        pos = flat.argmax(axis=0)
        yi, xi = np.unravel_index(pos, (h, w))
        logit = flat[pos, np.arange(k)]
        # per-keypoint softmax prob over the roi map
        stable = flat - flat.max(axis=0, keepdims=True)
        prob = np.exp(stable[pos, np.arange(k)]) / np.exp(stable).sum(
            axis=0
        )
        out[i, :, 0] = (xi + 0.5) * (widths[i] / w) + rois[i, 0]
        out[i, :, 1] = (yi + 0.5) * (heights[i] / h) + rois[i, 1]
        out[i, :, 2] = prob
        out[i, :, 2] = np.where(np.isfinite(logit), out[i, :, 2], 0)
    return out
