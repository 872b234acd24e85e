"""Deformable convolution v1/v2 for TPU.

Replaces the reference CUDA kernels (paa_core/csrc/cuda/deform_conv_cuda.cu,
deform_conv_kernel_cuda.cu: im2col-with-offsets + GEMM, modulation mask for
v2) with a TPU-native formulation: the offset/mask branch is a regular
zero-initialized conv (like DFConv2d, paa_core/layers/misc.py:113-185);
sampling is expressed as batched bilinear gathers building an
im2col tensor (B, Ho, Wo, K*C) which contracts against the (K*C, O)
weight on the MXU in one matmul. Autodiff gives the backward-input /
backward-offset / backward-weight passes for free (the CUDA kernels'
hand-written backprop).

Offset channel layout matches torch deform_conv2d: per deformable group,
per kernel position (row-major), a (dy, dx) pair; the modulation mask
follows after all offsets in the single offset-conv output (DFConv2d packs
offsets then mask and applies sigmoid to the mask slice).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..modeling.layers import conv as regular_conv
from ..modeling.layers import kaiming_uniform_a1


def deform_conv2d(x, offsets, mask, weights, strides=1, padding=1,
                  dilation=1, groups=1, deformable_groups=1):
    """Functional modulated deformable conv.

    Sampling strategy ("quad gather"): the four bilinear corners of one
    sample are a 2x2 pixel patch, so a patch tensor over the
    zero-extended grid — q[y, x] = concat of x at (y-1..y, x-1..x) with
    zeros outside — turns each sample into ONE row gather of 4C channels
    instead of four C-channel gathers. One `take_along_axis` per
    deformable group fetches all K*Ho*Wo samples; corner weights (with
    the CUDA kernel's (-1, H)x(-1, W) center gate,
    deform_conv_kernel_cuda.cu:236-245) and the v2 modulation mask fold
    into a single per-sample 4-vector contraction before the MXU matmul.
    Compared to per-corner gathers this cuts the HLO to one gather op
    per dg (36x fewer — full dcnv2 backbones compile in minutes, not
    hours) at equal-or-better runtime; XLA's TPU gather is the
    bandwidth bound either way (see PERF.md).

    Args:
        x: (B, H, W, C)
        offsets: (B, Ho, Wo, dg*K*2) as (dy, dx) pairs
        mask: (B, Ho, Wo, dg*K) already sigmoided, or None (v1)
        weights: (kh, kw, C/groups, O) HWIO
    Returns (B, Ho, Wo, O).
    """
    b, h, w, c = x.shape
    kh, kw, cin_g, o = weights.shape
    k = kh * kw
    s, p, d = strides, padding, dilation
    ho = (h + 2 * p - d * (kh - 1) - 1) // s + 1
    wo = (w + 2 * p - d * (kw - 1) - 1) // s + 1
    dg = deformable_groups
    cg = c // dg
    f32 = jnp.float32

    # sample coordinates (B, Ho, Wo, dg, K); coordinate math in f32 —
    # bf16 positions lose whole pixels beyond ~256
    base_y = (jnp.arange(ho, dtype=f32) * s - p)[:, None, None, None]
    base_x = (jnp.arange(wo, dtype=f32) * s - p)[None, :, None, None]
    ks = jnp.arange(k, dtype=f32)
    ky = ((ks // kw) * d)[None, None, None, :]
    kx = ((ks % kw) * d)[None, None, None, :]
    offsets = offsets.astype(f32).reshape(b, ho, wo, dg, k, 2)
    ys = base_y[None] + ky[None] + offsets[..., 0]
    xs = base_x[None] + kx[None] + offsets[..., 1]

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    # the CUDA center gate: whole sample is zero unless the point lies
    # strictly inside (-1, H) x (-1, W)
    gate = ((ys > -1) & (ys < h) & (xs > -1) & (xs < w)).astype(f32)
    y0i = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
    x0i = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
    flat = y0i * (w + 1) + x0i  # rows of the (H+1)*(W+1) patch grid

    cw = jnp.stack(
        [(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx],
        axis=-1,
    ) * gate[..., None]  # (B, Ho, Wo, dg, K, 4)
    if mask is not None:
        cw = cw * mask.astype(f32).reshape(b, ho, wo, dg, k)[..., None]
    cw = cw.astype(x.dtype)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    col_groups = []
    for g in range(dg):
        xg = xp[..., g * cg:(g + 1) * cg]
        q = jnp.concatenate(
            [xg[:, :-1, :-1], xg[:, :-1, 1:],
             xg[:, 1:, :-1], xg[:, 1:, 1:]],
            axis=-1,
        ).reshape(b, (h + 1) * (w + 1), 4 * cg)
        fg = flat[..., g, :].reshape(b, -1)  # (B, Ho*Wo*K)
        gq = jnp.take_along_axis(q, fg[:, :, None], axis=1)
        gq = gq.reshape(b, ho, wo, k, 4, cg)
        col_groups.append(
            jnp.einsum("bhwkqc,bhwkq->bhwkc", gq, cw[:, :, :, g])
        )
    col = (
        col_groups[0] if dg == 1
        else jnp.concatenate(col_groups, axis=-1)
    )  # (B, Ho, Wo, K, C)

    if groups == 1:
        out = jnp.einsum(
            "bhwkc,kco->bhwo",
            col,
            weights.reshape(k, cin_g, o),
            preferred_element_type=jnp.float32,
        )
    else:
        og = o // groups
        w_k = weights.reshape(k, cin_g, o)
        outs = []
        for g in range(groups):
            outs.append(
                jnp.einsum(
                    "bhwkc,kco->bhwo",
                    col[..., g * cin_g:(g + 1) * cin_g],
                    w_k[:, :, g * og:(g + 1) * og],
                    preferred_element_type=jnp.float32,
                )
            )
        out = jnp.concatenate(outs, axis=-1)
    return out.astype(x.dtype)


class DeformConv(nn.Module):
    """Flax module: offset conv (zero-init, like DFConv2d) + deformable
    sampling + weight contraction. ``modulated`` selects v2."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 1
    modulated: bool = True
    use_bias: bool = False
    kernel_init: Any = kaiming_uniform_a1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size * self.kernel_size
        dg = self.deformable_groups
        n_off = dg * k * 2
        n_out = n_off + (dg * k if self.modulated else 0)
        offset_mask = regular_conv(
            n_out, self.kernel_size, strides=self.strides,
            padding=self.padding, dilation=self.dilation, use_bias=True,
            kernel_init=nn.initializers.zeros, dtype=self.dtype,
            name="offset",
        )(x)
        offsets = offset_mask[..., :n_off]
        mask = (
            jax.nn.sigmoid(offset_mask[..., n_off:])
            if self.modulated
            else None
        )
        c = x.shape[-1]
        weights = self.param(
            "kernel",
            self.kernel_init,
            (
                self.kernel_size, self.kernel_size,
                c // self.groups, self.features,
            ),
        )
        out = deform_conv2d(
            x, offsets, mask,
            weights.astype(x.dtype),
            strides=self.strides, padding=self.padding,
            dilation=self.dilation, groups=self.groups,
            deformable_groups=dg,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            out = out + bias.astype(out.dtype)
        return out
