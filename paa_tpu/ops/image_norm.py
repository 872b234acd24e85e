"""On-device image normalization for uint8 input batches.

TPU-first input contract: the host ships the padded batch as RAW uint8
(4x fewer bytes over host->HBM than normalized float32 — measured
20.8 s of a 24 s TTA batch was float32 H2D on the tunneled v5e) and the
jitted program casts + normalizes + re-zeroes the padding on device,
where it fuses into the stem convolution's input processing for free.

Exactness: matches the host path (transforms.normalize_image into a
zero-padded float32 buffer — itself matching the reference's
Normalize-then-pad-with-zeros order, paa_core/data/transforms/
transforms.py + structures/image_list.py:54-61) bit for bit: the
uint8->float32 cast is exact, the (x - mean) / std op order is
identical, and padding is forced back to 0.0 (a raw zero byte would
otherwise normalize to -mean/std).

Every jitted entry point (train step, eval fn, TTA fn) dispatches on
``images.dtype`` at trace time, so float32 inputs (tests, export
callers, pre-normalized pipelines) run unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def device_normalize(images, image_sizes, pixel_mean, pixel_std):
    """(B, H, W, 3) uint8 + per-image valid (h, w) -> normalized float32
    with zeroed padding."""
    x = images.astype(jnp.float32)
    mean = jnp.asarray(pixel_mean, jnp.float32)
    x = x - mean
    std = np.asarray(pixel_std, np.float32)
    if np.any(std != 1.0):  # matches normalize_image's skip (x/1.0 == x)
        x = x / jnp.asarray(std)
    h, w = images.shape[1:3]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    valid = (ys[None, :, None] < image_sizes[:, 0, None, None]) & (
        xs[None, None, :] < image_sizes[:, 1, None, None]
    )
    return jnp.where(valid[..., None], x, 0.0)


def maybe_device_normalize(images, image_sizes, pixel_mean, pixel_std):
    """dtype-dispatched at trace time: uint8 batches normalize on
    device; float32 batches (already host-normalized) pass through."""
    if images.dtype == jnp.uint8:
        if image_sizes is None:
            raise ValueError(
                "uint8 image batches require image_sizes to re-zero "
                "the padded region on device"
            )
        return device_normalize(images, image_sizes, pixel_mean, pixel_std)
    return images
