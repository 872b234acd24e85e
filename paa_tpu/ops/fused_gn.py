"""Fused GroupNorm(+ReLU) Pallas kernel for the head towers.

Motivation (PERF.md): the PAA head towers are 8x [conv, GN(32), ReLU]
per level; XLA lowers each GN as a stats reduction pass PLUS a
normalize pass over the conv output — two HBM reads and one write, and
the four convert+reduce fusions are ~13 ms of a 95 ms flagship forward
(B=32). This kernel keeps each image's (H*W, C-tile) slice resident in
VMEM across output chunks (the input BlockSpec index is constant in the
innermost grid dimension, so pallas does not re-fetch it), computes the
group statistics once, and streams normalized+activated chunks out:
ONE HBM read + one write.

Replaces nothing semantically: `GroupNorm32` keeps the identical
parameter tree (gn/scale, gn/bias) and the flax path remains the
default; `MODEL.TPU.FUSED_GN` opts the towers in. Gradients route
through a jnp reference implementation via jax.custom_vjp (the backward
was never the bottleneck; only the inference/forward pass is fused).

Matches reference semantics: make_layers.py group_norm -> torch
nn.GroupNorm(32, C, eps=1e-5) followed by ReLU in the tower
(rpn/paa/paa.py:33-44).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# lane width of one column tile; group width (C // num_groups) must
# divide it so every group's channels live in a single tile
_CW = 128
# output chunk rows per grid step (multiple of every dtype's sublane)
_CH = 1024


def _gn_relu_reference(x, scale, bias, num_groups, eps, relu):
    """Pure-jnp GroupNorm(+ReLU), f32 statistics — the numerics spec
    for the kernel and the VJP used for the backward pass."""
    b, h, w, c = x.shape
    gw = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, gw)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.square(xf - mean).mean(axis=(1, 3), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xn.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)


def _group_spread(gw):
    """(_CW, _CW) 0/1 matrix: spread[i, j] = 1 iff channels i, j share
    a group. csum @ spread sums each group's channels and broadcasts
    the total back to every member channel — a single tiny MXU matmul
    instead of cross-lane reshapes."""
    g = np.arange(_CW) // gw
    return (g[:, None] == g[None, :]).astype(np.float32)


def _gn_kernel(x_ref, s_ref, b_ref, sp_ref, o_ref, ab_ref, *, hw, gw,
               eps, relu):
    """Grid (B, C // _CW, n_chunks), innermost chunk index j.

    x_ref: (HW_pad, _CW) — the whole per-(image, column-tile) slice,
    resident across j. o_ref: (_CH, _CW) chunk. ab_ref: (2, _CW) f32
    scratch holding the per-channel affine (a, b) with the group
    statistics folded in; computed once at j == 0."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        spread = sp_ref[:]
        xf = x_ref[:].astype(jnp.float32)  # (HW_blk, _CW)
        n = float(hw * gw)
        # the block over-spans the array when hw is not a chunk
        # multiple (edge block): rows >= hw hold undefined pad data —
        # mask BOTH passes and divide by the true hw
        rows = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 0)
        live = rows < hw
        csum = jnp.sum(
            jnp.where(live, xf, 0.0), axis=0, keepdims=True
        )  # (1, _CW)
        mean_c = jax.lax.dot(
            csum, spread, precision=jax.lax.Precision.HIGHEST
        ) / n
        # second pass (VMEM-resident) for the variance
        d = jnp.where(live, xf - mean_c, 0.0)
        cvar = jnp.sum(d * d, axis=0, keepdims=True)
        gvar = jax.lax.dot(
            cvar, spread, precision=jax.lax.Precision.HIGHEST
        ) / n
        a = s_ref[:].astype(jnp.float32) * jax.lax.rsqrt(gvar + eps)
        ab_ref[0:1, :] = a
        ab_ref[1:2, :] = b_ref[:].astype(jnp.float32) - mean_c * a

    chunk = x_ref[pl.ds(j * _CH, _CH), :].astype(jnp.float32)
    out = chunk * ab_ref[0:1, :] + ab_ref[1:2, :]
    if relu:
        out = jnp.maximum(out, 0.0)
    o_ref[:] = out.astype(o_ref.dtype)


def _fused_forward(x, scale, bias, num_groups, eps, relu):
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    hw = h * w
    gw = c // num_groups
    x2 = x.reshape(b, hw, c)
    ncols = c // _CW
    nchunks = -(-hw // _CH)  # edge blocks: no pad/slice copies needed
    hw_blk = nchunks * _CH
    s2 = scale.reshape(ncols, 1, _CW)
    b2 = bias.reshape(ncols, 1, _CW)

    out = pl.pallas_call(
        partial(_gn_kernel, hw=hw, gw=gw, eps=eps, relu=relu),
        grid=(b, ncols, nchunks),
        in_specs=[
            # whole per-(image, column-tile) slice; constant in j ->
            # stays VMEM-resident across the output chunks
            pl.BlockSpec(
                (None, hw_blk, _CW), lambda i, cc, j: (i, 0, cc)
            ),
            pl.BlockSpec((None, 1, _CW), lambda i, cc, j: (cc, 0, 0)),
            pl.BlockSpec((None, 1, _CW), lambda i, cc, j: (cc, 0, 0)),
            pl.BlockSpec((_CW, _CW), lambda i, cc, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, _CH, _CW), lambda i, cc, j: (i, j, cc)
        ),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, _CW), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(x2, s2, b2, jnp.asarray(_group_spread(gw)))
    return out.reshape(b, h, w, c)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm_relu(x, scale, bias, num_groups=32, eps=1e-5,
                          relu=True):
    """GroupNorm(num_groups, eps) + optional ReLU in one HBM pass.

    x: (B, H, W, C) with C % 128 == 0 and (C // num_groups) | 128;
    scale/bias: (C,). Falls back to the jnp reference for shapes the
    kernel does not tile (tiny levels included: below one chunk of
    rows there is no second HBM pass to save)."""
    b, h, w, c = x.shape
    gw = c // num_groups
    if c % _CW or _CW % gw or h * w < _CH:
        return _gn_relu_reference(x, scale, bias, num_groups, eps, relu)
    return _fused_forward(x, scale, bias, num_groups, eps, relu)


def _fwd(x, scale, bias, num_groups, eps, relu):
    out = fused_group_norm_relu(x, scale, bias, num_groups, eps, relu)
    return out, (x, scale, bias)


def _bwd(num_groups, eps, relu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _gn_relu_reference(
            xx, ss, bb, num_groups, eps, relu
        ),
        x, scale, bias,
    )
    return vjp(g)


fused_group_norm_relu.defvjp(_fwd, _bwd)
