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


def _bilinear_gather(x, ys, xs):
    """Sample x (B, H, W, C) at float coords ys/xs (B, Ho, Wo) with
    zero padding outside. Returns (B, Ho, Wo, C)."""
    b, h, w, c = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def corner(yi, xi, wt):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat = yc * w + xc  # (B, Ho, Wo)
        g = jax.vmap(lambda xf, i: xf[i])(
            x.reshape(b, h * w, c), flat.reshape(b, -1)
        ).reshape(*flat.shape, c)
        return g * (wt * valid.astype(x.dtype))[..., None]

    return (
        corner(y0i, x0i, (1 - wy1) * (1 - wx1))
        + corner(y0i, x0i + 1, (1 - wy1) * wx1)
        + corner(y0i + 1, x0i, wy1 * (1 - wx1))
        + corner(y0i + 1, x0i + 1, wy1 * wx1)
    )


def deform_conv2d(x, offsets, mask, weights, strides=1, padding=1,
                  dilation=1, groups=1, deformable_groups=1):
    """Functional modulated deformable conv.

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

    base_y = jnp.arange(ho, dtype=x.dtype) * s - p
    base_x = jnp.arange(wo, dtype=x.dtype) * s - p
    grid_y = base_y[:, None]  # (Ho, 1)
    grid_x = base_x[None, :]  # (1, Wo)

    offsets = offsets.astype(x.dtype).reshape(b, ho, wo, dg, k, 2)
    if mask is not None:
        mask = mask.astype(x.dtype).reshape(b, ho, wo, dg, k)

    cols = []
    for ki in range(k):
        iy, ix = divmod(ki, kw)
        samples_g = []
        for g in range(dg):
            ys = grid_y[None] + iy * d + offsets[..., g, ki, 0]
            xs = grid_x[None] + ix * d + offsets[..., g, ki, 1]
            sg = _bilinear_gather(
                x[..., g * cg:(g + 1) * cg], ys, xs
            )
            if mask is not None:
                sg = sg * mask[..., g, ki][..., None]
            samples_g.append(sg)
        cols.append(jnp.concatenate(samples_g, axis=-1))
    # (B, Ho, Wo, K, C) -> contract with weights on the MXU
    col = jnp.stack(cols, axis=3)

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
