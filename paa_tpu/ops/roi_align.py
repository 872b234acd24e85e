"""ROIAlign / ROIPool for TPU.

Replaces the reference CUDA kernels (paa_core/csrc/cuda/ROIAlign_cuda.cu,
ROIPool_cuda.cu) with batched bilinear-gather formulations; autodiff
provides the backward passes. Semantics follow the legacy
maskrcnn-benchmark ROIAlign (aligned=False: no -0.5 half-pixel offset,
``roi_width = max(end - start, 1)``, ``sampling_ratio`` samples per bin
averaged; ROIAlign_cuda.cu:24-90).

Also provides the FPN ``Pooler``'s scale-based level assignment
(modeling/poolers.py LevelMapper): lvl = floor(lvl0 + log2(sqrt(area)/224))
clamped to [k_min, k_max] — computed with the +1-convention BoxList area.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_at(feat, y, x):
    """Sample feat (H, W, C) at float coords y (...,), x (...,) with
    zero padding outside [0, H-1] x [0, W-1] (matching the CUDA kernel's
    boundary handling: samples with y < -1 or y > H are zero; edge
    samples clamp)."""
    h, w, c = feat.shape
    # CUDA kernel: if (y < -1.0 || y > height) -> 0; clamp y<0 to 0
    valid = (y >= -1.0) & (y <= h) & (x >= -1.0) & (x <= w)
    y = jnp.clip(y, 0.0, h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = y - y0
    lx = x - x0

    def g(yy, xx):
        flat = (yy.astype(jnp.int32) * w + xx.astype(jnp.int32)).reshape(-1)
        return feat.reshape(h * w, c)[flat].reshape(*yy.shape, c)

    out = (
        g(y0, x0) * ((1 - ly) * (1 - lx))[..., None]
        + g(y0, x1) * ((1 - ly) * lx)[..., None]
        + g(y1, x0) * (ly * (1 - lx))[..., None]
        + g(y1, x1) * (ly * lx)[..., None]
    )
    return out * valid[..., None].astype(feat.dtype)


def roi_align_single(feat, roi, output_size, spatial_scale,
                     sampling_ratio):
    """ROIAlign of one roi (4,) xyxy against one feature map (H, W, C).

    Returns (ph, pw, C)."""
    ph, pw = output_size
    start_w = roi[0] * spatial_scale
    start_h = roi[1] * spatial_scale
    end_w = roi[2] * spatial_scale
    end_h = roi[3] * spatial_scale
    roi_w = jnp.maximum(end_w - start_w, 1.0)
    roi_h = jnp.maximum(end_h - start_h, 1.0)
    bin_h = roi_h / ph
    bin_w = roi_w / pw

    sr = sampling_ratio
    assert sr > 0, "adaptive sampling_ratio not supported; set >0"
    # sample grid (ph*sr, pw*sr)
    iy = (jnp.arange(ph * sr) + 0.5) / sr  # in bin units
    ix = (jnp.arange(pw * sr) + 0.5) / sr
    ys = start_h + iy * bin_h  # (ph*sr,)
    xs = start_w + ix * bin_w
    yy = jnp.broadcast_to(ys[:, None], (ph * sr, pw * sr))
    xx = jnp.broadcast_to(xs[None, :], (ph * sr, pw * sr))
    samples = _bilinear_at(feat, yy, xx)  # (ph*sr, pw*sr, C)
    c = samples.shape[-1]
    samples = samples.reshape(ph, sr, pw, sr, c)
    return samples.mean(axis=(1, 3))


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(features, rois, roi_batch_idx, output_size=(7, 7),
              spatial_scale=1.0, sampling_ratio=2):
    """Batched ROIAlign.

    features: (B, H, W, C); rois: (R, 4) xyxy in input coords;
    roi_batch_idx: (R,) int image index per roi.
    Returns (R, ph, pw, C).
    """
    def one(roi, bi):
        return roi_align_single(
            features[bi], roi, output_size, spatial_scale, sampling_ratio
        )

    return jax.vmap(one)(rois.astype(jnp.float32),
                         roi_batch_idx.astype(jnp.int32))


@partial(jax.jit, static_argnames=("output_size",))
def roi_pool(features, rois, roi_batch_idx, output_size=(7, 7),
             spatial_scale=1.0):
    """Max ROI pooling (ROIPool_cuda.cu semantics: integer bin grid via
    round, max over bin, empty bins -> 0)."""
    ph, pw = output_size
    b, h, w, c = features.shape

    def one(roi, bi):
        feat = features[bi]
        start_w = jnp.round(roi[0] * spatial_scale)
        start_h = jnp.round(roi[1] * spatial_scale)
        end_w = jnp.round(roi[2] * spatial_scale)
        end_h = jnp.round(roi[3] * spatial_scale)
        roi_w = jnp.maximum(end_w - start_w + 1, 1.0)
        roi_h = jnp.maximum(end_h - start_h + 1, 1.0)
        bin_h = roi_h / ph
        bin_w = roi_w / pw

        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)

        out = []
        for py in range(ph):
            hstart = jnp.clip(
                jnp.floor(py * bin_h) + start_h, 0, h
            )
            hend = jnp.clip(
                jnp.ceil((py + 1) * bin_h) + start_h, 0, h
            )
            row = []
            for px in range(pw):
                wstart = jnp.clip(
                    jnp.floor(px * bin_w) + start_w, 0, w
                )
                wend = jnp.clip(
                    jnp.ceil((px + 1) * bin_w) + start_w, 0, w
                )
                mask = (
                    (ys[:, None] >= hstart) & (ys[:, None] < hend)
                    & (xs[None, :] >= wstart) & (xs[None, :] < wend)
                )
                is_empty = (hend <= hstart) | (wend <= wstart)
                v = jnp.where(
                    mask[..., None], feat, -jnp.inf
                ).max(axis=(0, 1))
                row.append(jnp.where(is_empty, 0.0, v))
            out.append(jnp.stack(row))
        return jnp.stack(out)

    return jax.vmap(one)(rois.astype(jnp.float32),
                         roi_batch_idx.astype(jnp.int32))


def fpn_level_for_rois(rois, k_min=2, k_max=5, canonical_scale=224,
                       canonical_level=4, eps=1e-6):
    """LevelMapper (reference modeling/poolers.py:11-36): target FPN
    level per roi from its sqrt-area, +1 box convention."""
    w = rois[:, 2] - rois[:, 0] + 1.0
    h = rois[:, 3] - rois[:, 1] + 1.0
    s = jnp.sqrt(w * h)
    lvl = jnp.floor(
        canonical_level + jnp.log2(s / canonical_scale + eps)
    )
    return jnp.clip(lvl, k_min, k_max).astype(jnp.int32) - k_min


def multilevel_roi_align(features, rois, roi_batch_idx, output_size=(7, 7),
                         scales=(0.25, 0.125, 0.0625, 0.03125),
                         sampling_ratio=2):
    """FPN Pooler (poolers.py:39-124): each roi pools from the level
    chosen by its scale. Static-shape formulation: align on EVERY level
    and one-hot select — 4x the gather work but no dynamic partitioning
    (R is small; the MXU is idle here anyway)."""
    k_min = int(-math.log2(scales[0]))
    k_max = int(-math.log2(scales[-1]))
    levels = fpn_level_for_rois(rois, k_min=k_min, k_max=k_max)
    outs = []
    for li, (feat, scale) in enumerate(zip(features, scales)):
        outs.append(
            roi_align(
                feat, rois, roi_batch_idx, output_size, scale,
                sampling_ratio,
            )
        )
    stacked = jnp.stack(outs, axis=0)  # (L, R, ph, pw, C)
    onehot = jax.nn.one_hot(
        levels, len(scales), axis=0, dtype=stacked.dtype
    )  # (L, R)
    return (stacked * onehot[:, :, None, None, None]).sum(axis=0)
