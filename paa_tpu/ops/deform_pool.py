"""Deformable (modulated) position-sensitive ROI pooling.

TPU-native replacement for the reference CUDA op
``deform_psroi_pooling_forward`` (paa_core/csrc/cuda/
deform_pool_kernel_cuda.cu DeformablePSROIPoolForwardKernel, used by
layers/dcn/deform_pool_*.py): each ROI is divided into out_size^2 bins;
every bin averages ``sample_per_part``^2 bilinear samples taken from the
position-sensitive channel group of that bin, at locations shifted by a
learned per-part offset (``trans`` branch, scaled by ``trans_std``).
Out-of-image samples are skipped (masked), exactly like the kernel's
continue path; the bin value is sum/valid-count.

Layouts are NHWC (TPU-native); the reference is NCHW. Semantics are
validated against a numpy transcription of the CUDA kernel in
tests/test_deform_pool.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear(feat, x, y):
    """feat: (H, W, C); x, y scalars (already clamped in-range)."""
    x1 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.floor(y).astype(jnp.int32)
    x2 = jnp.ceil(x).astype(jnp.int32)
    y2 = jnp.ceil(y).astype(jnp.int32)
    dx = x - x1
    dy = y - y1
    v11 = feat[y1, x1]
    v12 = feat[y2, x1]
    v21 = feat[y1, x2]
    v22 = feat[y2, x2]
    return (
        (1 - dx) * (1 - dy) * v11
        + (1 - dx) * dy * v12
        + dx * (1 - dy) * v21
        + dx * dy * v22
    )


def deform_psroi_pool(features, rois, roi_batch_idx, trans=None, *,
                      spatial_scale, out_size, out_channels, group_size,
                      part_size=None, sample_per_part=4, trans_std=0.1):
    """Args:
        features: (B, H, W, C) with C == out_channels * group_size^2,
            position-sensitive channel order c = (ctop*G + gh)*G + gw
            (matching the kernel's NCHW channel index).
        rois: (R, 4) xyxy boxes in image coordinates.
        roi_batch_idx: (R,) int32.
        trans: (R, part_size, part_size, 2 * num_classes) learned
            offsets ((x, y) interleaved per class: channel 2k = x of
            class k, 2k+1 = y) or None (no_trans).

    Returns (R, out_size, out_size, out_channels) pooled values.
    """
    if part_size is None:
        part_size = out_size
    b, height, width, c = features.shape
    g = group_size
    d = out_channels
    assert c == d * g * g, (c, d, g)
    num_classes = 1 if trans is None else trans.shape[-1] // 2
    channels_each_class = d // num_classes
    s = sample_per_part

    ph = jnp.arange(out_size)
    pw = jnp.arange(out_size)
    # per-bin group cell (gh, gw) and offset part cell (part_h, part_w)
    gh = jnp.clip((ph * g) // out_size, 0, g - 1)
    gw = jnp.clip((pw * g) // out_size, 0, g - 1)
    part_h = jnp.floor(ph.astype(jnp.float32) / out_size * part_size
                       ).astype(jnp.int32)
    part_w = jnp.floor(pw.astype(jnp.float32) / out_size * part_size
                       ).astype(jnp.int32)

    def one_roi(feat, roi, tr):
        x0 = jnp.round(roi[0]) * spatial_scale - 0.5
        y0 = jnp.round(roi[1]) * spatial_scale - 0.5
        x1 = (jnp.round(roi[2]) + 1.0) * spatial_scale - 0.5
        y1 = (jnp.round(roi[3]) + 1.0) * spatial_scale - 0.5
        roi_w = jnp.maximum(x1 - x0, 0.1)
        roi_h = jnp.maximum(y1 - y0, 0.1)
        bin_w = roi_w / out_size
        bin_h = roi_h / out_size
        sub_w = bin_w / s
        sub_h = bin_h / s

        def one_class(cls):
            if tr is None:
                tx = jnp.zeros((out_size, out_size))
                ty = jnp.zeros((out_size, out_size))
            else:
                tx = tr[part_h[:, None], part_w[None, :], 2 * cls] * trans_std
                ty = tr[part_h[:, None], part_w[None, :], 2 * cls + 1] * trans_std
            # bin start (out_size, out_size)
            wstart = pw[None, :] * bin_w + x0 + tx * roi_w
            hstart = ph[:, None] * bin_h + y0 + ty * roi_h
            # sample grid (out_size, out_size, s, s)
            w_pts = wstart[..., None, None] + jnp.arange(s)[None, None, None, :] * sub_w
            h_pts = hstart[..., None, None] + jnp.arange(s)[None, None, :, None] * sub_h
            valid = (
                (w_pts >= -0.5) & (w_pts <= width - 0.5)
                & (h_pts >= -0.5) & (h_pts <= height - 0.5)
            )
            wc = jnp.clip(w_pts, 0.0, width - 1.0)
            hc = jnp.clip(h_pts, 0.0, height - 1.0)

            # channels of this class at each bin's group cell:
            # c = (ctop*G + gh)*G + gw for ctop in this class's range
            ctop = cls * channels_each_class + jnp.arange(
                channels_each_class
            )

            def bin_value(py, px):
                chan = (ctop * g + gh[py]) * g + gw[px]
                f = feat[:, :, chan]  # (H, W, Dc)

                def sample(sy, sx):
                    v = _bilinear(f, wc[py, px, sy, sx], hc[py, px, sy, sx])
                    return jnp.where(valid[py, px, sy, sx], v, 0.0), valid[
                        py, px, sy, sx
                    ]

                vals, oks = jax.vmap(
                    lambda sy: jax.vmap(lambda sx: sample(sy, sx))(
                        jnp.arange(s)
                    )
                )(jnp.arange(s))
                cnt = oks.sum()
                return jnp.where(
                    cnt > 0, vals.sum(axis=(0, 1)) / jnp.maximum(cnt, 1), 0.0
                )

            return jax.vmap(
                lambda py: jax.vmap(lambda px: bin_value(py, px))(pw)
            )(ph)  # (P, P, Dc)

        parts = [one_class(cls) for cls in range(num_classes)]
        return jnp.concatenate(parts, axis=-1)  # (P, P, D)

    feats_per_roi = features[roi_batch_idx]
    if trans is None:
        return jax.vmap(lambda f, r: one_roi(f, r, None))(
            feats_per_roi, rois.astype(jnp.float32)
        )
    return jax.vmap(one_roi)(
        feats_per_roi, rois.astype(jnp.float32), trans.astype(jnp.float32)
    )
