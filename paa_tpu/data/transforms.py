"""Numpy/cv2 image transforms.

Mirrors reference paa_core/data/transforms/transforms.py: shortest-side
resize with max cap (Resize.get_size, transforms.py:35-55), horizontal
flip with the BoxList +1-pixel transpose rule (bounding_box.py:180-199),
and Caffe2 BGRx255 mean subtraction (transforms.py:84-97). Images are
decoded straight to BGR by cv2, so no channel flip is needed.
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import numpy as np


def get_resize_size(image_wh, size, max_size):
    """Exact reference resize rule (transforms.py:35-55).

    image_wh: (w, h); returns (oh, ow).
    """
    w, h = image_wh
    if max_size is not None:
        min_original = float(min(w, h))
        max_original = float(max(w, h))
        if max_original / min_original * size > max_size:
            size = int(round(max_size * min_original / max_original))

    if (w <= h and w == size) or (h <= w and h == size):
        return (h, w)
    if w < h:
        ow = size
        oh = int(size * h / w)
    else:
        oh = size
        ow = int(size * w / h)
    return (oh, ow)


def resize_image_and_boxes(image, boxes, size, max_size, rng=None):
    """Resize keeping aspect; size may be a list for multi-scale train
    (random choice, transforms.py:37)."""
    import cv2

    if isinstance(size, (list, tuple)):
        size = (rng or random).choice(list(size))
    h, w = image.shape[:2]
    oh, ow = get_resize_size((w, h), size, max_size)
    resized = cv2.resize(image, (ow, oh), interpolation=cv2.INTER_LINEAR)
    if boxes is not None and len(boxes):
        # BoxList.resize uses independent x/y ratios, no +1 correction
        ratio_w = ow / w
        ratio_h = oh / h
        boxes = boxes * np.array(
            [ratio_w, ratio_h, ratio_w, ratio_h], dtype=np.float32
        )
    return resized, boxes


def hflip_image_and_boxes(image, boxes):
    """Horizontal flip; boxes follow BoxList.transpose(0) with
    TO_REMOVE=1 (bounding_box.py:188-193)."""
    image = np.ascontiguousarray(image[:, ::-1])
    if boxes is not None and len(boxes):
        w = image.shape[1]
        x1 = w - boxes[:, 2] - 1.0
        x2 = w - boxes[:, 0] - 1.0
        boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], axis=1)
    return image, boxes


def normalize_image(image, pixel_mean, pixel_std, out=None):
    """uint8 BGR -> float32 normalized (Caffe2: mean subtract, std 1).

    ``out``: optional preallocated float32 destination (e.g. a view into
    the padded batch buffer) — the subtract writes straight into it,
    skipping two full-image temporaries. Bit-identical to the
    out-of-place path: same (x - mean) then /std op order in f32.
    """
    mean = np.asarray(pixel_mean, dtype=np.float32)
    std = np.asarray(pixel_std, dtype=np.float32)
    img = np.subtract(image, mean, out=out, dtype=np.float32)
    if np.any(std != 1.0):
        np.divide(img, std, out=img)
    return img


class TrainTransform:
    def __init__(self, min_sizes, max_size, pixel_mean, pixel_std,
                 flip_prob=0.5, seed=None, defer_normalize=False):
        """``defer_normalize``: return the resized/flipped uint8 image
        and let the caller normalize (the loader fuses normalization
        into batch assembly, writing (x - mean)/std straight into the
        padded batch buffer — one pass instead of three full-image
        temporaries; bit-identical values)."""
        self.min_sizes = (
            list(min_sizes) if isinstance(min_sizes, (list, tuple))
            else [min_sizes]
        )
        self.max_size = max_size
        self.pixel_mean = pixel_mean
        self.pixel_std = pixel_std
        self.flip_prob = flip_prob
        self.defer_normalize = defer_normalize
        self.rng = random.Random(seed)
        self._lock = __import__("threading").Lock()

    def __call__(self, image, boxes, masks=None, keypoints=None,
                 draws=None):
        """``draws=(size_draw, flip_draw)`` in [0,1) makes the
        augmentation deterministic per sample — the loader derives them
        from (seed, epoch, index) so every data-parallel process agrees
        on realized sizes (and hence bucket shapes) without
        communication. Without ``draws`` the shared RNG is used (thread
        order then affects which sample gets which draw)."""
        if draws is None:
            with self._lock:  # the shared RNG is used from loader threads
                size_draw = self.rng.random()
                flip_draw = self.rng.random()
        else:
            size_draw, flip_draw = draws
        oh, ow = image.shape[:2]
        image, boxes = resize_image_and_boxes(
            image, boxes,
            self.min_sizes[int(size_draw * len(self.min_sizes))],
            self.max_size,
        )
        if keypoints is not None and len(keypoints):
            from ..structures.keypoints import resize_keypoints

            nh, nw = image.shape[:2]
            keypoints = resize_keypoints(keypoints, nw / ow, nh / oh)
        if flip_draw < self.flip_prob:
            image, boxes = hflip_image_and_boxes(image, boxes)
            if masks is not None:
                # box-normalized masks flip with the image
                masks = np.ascontiguousarray(masks[:, :, ::-1])
            if keypoints is not None and len(keypoints):
                from ..structures.keypoints import flip_keypoints

                keypoints = flip_keypoints(keypoints, image.shape[1])
        if not self.defer_normalize:
            image = normalize_image(image, self.pixel_mean, self.pixel_std)
        out = (image, boxes)
        if masks is not None:
            out = out + (masks,)
        if keypoints is not None:
            out = out + (keypoints,)
        return out


class EvalTransform:
    def __init__(self, min_size, max_size, pixel_mean, pixel_std,
                 defer_normalize=False):
        self.min_size = min_size
        self.max_size = max_size
        self.pixel_mean = pixel_mean
        self.pixel_std = pixel_std
        self.defer_normalize = defer_normalize

    def __call__(self, image, boxes=None, masks=None, keypoints=None,
                 draws=None):
        oh, ow = image.shape[:2]
        image, boxes = resize_image_and_boxes(
            image, boxes, self.min_size, self.max_size
        )
        if keypoints is not None and len(keypoints):
            from ..structures.keypoints import resize_keypoints

            nh, nw = image.shape[:2]
            keypoints = resize_keypoints(keypoints, nw / ow, nh / oh)
        if not self.defer_normalize:
            image = normalize_image(image, self.pixel_mean, self.pixel_std)
        out = (image, boxes)
        if masks is not None:
            out = out + (masks,)
        if keypoints is not None:
            out = out + (keypoints,)
        return out


def build_transforms(cfg, is_train=True, seed=None,
                     defer_normalize=False):
    """Mirror of reference data/transforms/build.py:5-36 incl. the
    MIN_SIZE_RANGE_TRAIN expansion."""
    if is_train:
        if cfg.INPUT.MIN_SIZE_RANGE_TRAIN[0] == -1:
            min_size = cfg.INPUT.MIN_SIZE_TRAIN
        else:
            lo, hi = cfg.INPUT.MIN_SIZE_RANGE_TRAIN
            min_size = list(range(lo, hi + 1))
        return TrainTransform(
            min_size, cfg.INPUT.MAX_SIZE_TRAIN, cfg.INPUT.PIXEL_MEAN,
            cfg.INPUT.PIXEL_STD, flip_prob=0.5, seed=seed,
            defer_normalize=defer_normalize,
        )
    return EvalTransform(
        cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST,
        cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD,
        defer_normalize=defer_normalize,
    )
