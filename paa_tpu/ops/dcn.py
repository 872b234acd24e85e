"""Deformable convolution v1/v2 for TPU.

Replaces the reference CUDA kernels (paa_core/csrc/cuda/deform_conv_cuda.cu,
deform_conv_kernel_cuda.cu: im2col-with-offsets + GEMM, modulation mask for
v2) with TPU-native formulations. The offset/mask branch is a regular
zero-initialized conv (like DFConv2d, paa_core/layers/misc.py:113-185);
the deformable sampling has two interchangeable lowerings:

1. ``gather`` — batched bilinear quad-gathers building an im2col tensor
   (B, Ho, Wo, K*C) contracted against the (K*C, O) weight on the MXU.
   Exact for arbitrary offsets, but bound by XLA's TPU gather emitter
   (~45 GB/s effective; see PERF.md): every sample re-reads its 4
   bilinear corners from HBM, a 36x read amplification over the feature
   map itself.

2. ``onehot`` — a windowed one-hot matmul that never gathers: the output
   grid is tiled; for each tile a small static window of the padded
   input is sliced out, and the bilinear sampling becomes a sparse
   interpolation matrix (4 weighted nonzeros per sample row, built with
   vectorized iota-compares) contracted against the window on the MXU.
   Exact whenever every active sample's corners stay inside its tile
   window (margin ``window_margin`` pixels beyond the static receptive
   field); trained DCN offsets are small, so this is the common case.

``auto`` computes the exact escape predicate and ``lax.cond``-selects:
onehot when no active sample escapes its window, gather otherwise — so
``auto`` is exact for arbitrary offsets like the CUDA kernels while
running at one-hot speed on realistic offset magnitudes. Autodiff gives
the backward-input / backward-offset / backward-weight passes for free
in both lowerings (the CUDA kernels' hand-written backprop); the onehot
backward is itself matmuls (no scatter).

``optimistic`` (inference) escapes ``auto``'s main cost — compiling BOTH
cond branches for every DCN layer (the dcnv2-R101 cold compile roughly
halves without the gather branches): the compiled program runs the pure
onehot lowering and merely REPORTS per-image escape flags
(``DeformConv`` sows them into the ``intermediates`` collection; the
eval path surfaces them as ``dcn_escaped``). Exactness moves to the
host: the inference engine lazily compiles a gather-pinned fallback and
re-runs any batch whose flag fires (engine/inference.py), so end-to-end
results still match the reference CUDA kernels for arbitrary offsets
while the hot program stays cond-free at pinned-onehot speed.

Offset channel layout matches torch deform_conv2d: per deformable group,
per kernel position (row-major), a (dy, dx) pair; the modulation mask
follows after all offsets in the single offset-conv output (DFConv2d packs
offsets then mask and applies sigmoid to the mask slice).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..modeling.layers import conv as regular_conv
from ..modeling.layers import kaiming_uniform_a1

# Process-wide default sampling mode and onehot window margin, set from
# cfg.TPU.{DCN_MODE,DCN_WINDOW_MARGIN} by build_detection_model.
# Per-call ``mode=`` / ``window_margin=`` override.
_DEFAULT_MODE = "auto"
_DEFAULT_MARGIN = 2


def set_default_dcn_mode(mode: str, window_margin: Optional[int] = None):
    global _DEFAULT_MODE, _DEFAULT_MARGIN
    if mode not in ("auto", "gather", "onehot", "optimistic"):
        raise ValueError(f"unknown DCN mode {mode!r}")
    _DEFAULT_MODE = mode
    if window_margin is not None:
        if window_margin < 0:
            raise ValueError("window_margin must be >= 0")
        _DEFAULT_MARGIN = window_margin


def resolve_dcn_mode(mode: Optional[str]) -> str:
    """Effective sampling mode for a per-call/module override of None."""
    return _DEFAULT_MODE if mode is None else mode


def dcn_escape_flags(x, offsets, mask, kernel_size=3, strides=1,
                     padding=1, dilation=1, deformable_groups=1,
                     window_margin: Optional[int] = None,
                     tile: Tuple[int, int] = (8, 16)):
    """Per-image escape predicate of the onehot window plan: (B,) bool,
    True where ANY nonzero-weight corner of that image falls outside its
    tile window (so only the gather lowering is exact for that image).
    This is ``auto``'s cond predicate, reduced per image instead of
    globally — the reporting half of ``optimistic`` mode."""
    window_margin = (
        _DEFAULT_MARGIN if window_margin is None else window_margin
    )
    kh = kw = kernel_size
    s, p, d, dg = strides, padding, dilation, deformable_groups
    b, h, w, _ = x.shape
    ho = (h + 2 * p - d * (kh - 1) - 1) // s + 1
    wo = (w + 2 * p - d * (kw - 1) - 1) // s + 1
    plan = _onehot_plan(h, w, ho, wo, kh, kw, s, d, p, tile, window_margin)
    y0p, x0p, cw = _geometry(x, offsets, mask, kh, kw, s, p, d, dg)
    th, tw, ti, tj, hw_win, ww_win, wsy, wsx = plan
    y0t = _tile_samples(y0p, th, tw, ti, tj)
    x0t = _tile_samples(x0p, th, tw, ti, tj)
    cwt = _tile_samples(cw, th, tw, ti, tj)
    wsy_a = jnp.asarray(wsy, jnp.int32)[None, :, None, None, None, None, None]
    wsx_a = jnp.asarray(wsx, jnp.int32)[None, None, :, None, None, None, None]
    ry0 = y0t - wsy_a
    rx0 = x0t - wsx_a
    ry = jnp.stack([ry0, ry0, ry0 + 1, ry0 + 1], axis=-1)
    rx = jnp.stack([rx0, rx0 + 1, rx0, rx0 + 1], axis=-1)
    oob = (ry < 0) | (ry >= hw_win) | (rx < 0) | (rx >= ww_win)
    esc = oob & (cwt != 0)
    return jnp.any(esc.reshape(b, -1), axis=1)


def _geometry(x, offsets, mask, kh, kw, s, p, d, dg):
    """Shared sample geometry.

    Returns corner indices in the 1-padded frame and folded corner
    weights:
      y0p, x0p: (B, Ho, Wo, dg, K) int32 — top-left corner of each
        sample's 2x2 patch, in padded coordinates (so 0 is the zero
        row/col left of the image); bottom-right corner is (+1, +1).
      cw: (B, Ho, Wo, dg, K, 4) f32 — bilinear corner weights with the
        CUDA center gate (zero unless the point lies strictly inside
        (-1, H) x (-1, W), deform_conv_kernel_cuda.cu:236-245) and the
        v2 modulation mask folded in, corner order
        (tl, tr, bl, br).
    Per-corner zeroing outside the image (deformable_im2col_bilinear,
    deform_conv_kernel_cuda.cu:93-124) is realized by the zero padding:
    clipped corner indices land on the padded zero ring.
    """
    b, h, w, c = x.shape
    k = kh * kw
    ho = (h + 2 * p - d * (kh - 1) - 1) // s + 1
    wo = (w + 2 * p - d * (kw - 1) - 1) // s + 1
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
    y0p = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
    x0p = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1

    cw = jnp.stack(
        [(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx],
        axis=-1,
    ) * gate[..., None]  # (B, Ho, Wo, dg, K, 4)
    if mask is not None:
        cw = cw * mask.astype(f32).reshape(b, ho, wo, dg, k)[..., None]
    return y0p, x0p, cw


def _contract_weights(col, weights, groups):
    """(B, Ho, Wo, K, C) im2col columns x (kh, kw, C/groups, O) HWIO
    weights -> (B, Ho, Wo, O): the GEMM the reference host code runs on
    the columns (deform_conv_cuda.cu: weight.view(g, O/g, C/g*k) @
    col.view(g, C/g*k, hw))."""
    k = weights.shape[0] * weights.shape[1]
    cin_g, o = weights.shape[2], weights.shape[3]
    if groups == 1:
        return jnp.einsum(
            "bhwkc,kco->bhwo",
            col,
            weights.reshape(k, cin_g, o),
            preferred_element_type=jnp.float32,
        )
    # grouped: one batched matmul with the group as a batch dim (a
    # Python loop of per-group einsums would emit `groups` HLOs — 64
    # per layer for X-101-64x4d). Narrow ResNeXt groups are merged into
    # 128-wide block-diagonal supergroups for MXU tile efficiency
    # (exact; ops/groupconv.py).
    from .groupconv import (
        expand_supergroup_matmul_weights,
        supergroup_plan,
    )

    og = o // groups
    b, ho, wo = col.shape[:3]
    # HWIO grouped weights carry per-group cin (dim 2) and the FULL
    # output dim split group-major along O (group g owns outputs
    # g*og:(g+1)*og)
    w_g = weights.reshape(k, cin_g, groups, og)
    g = groups
    plan = supergroup_plan(groups, cin_g, og)
    if plan is not None:
        m, g = plan
        w_g = expand_supergroup_matmul_weights(w_g, groups, m)
    col_g = col.reshape(b, ho, wo, k, g, (cin_g * groups) // g)
    out = jnp.einsum(
        "bhwkgc,kcgo->bhwgo",
        col_g,
        w_g,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, ho, wo, o)


def _gather_cols(x, y0p, x0p, cw, dg):
    """Quad-gather im2col: the four bilinear corners of one sample are a
    2x2 pixel patch, so a patch tensor over the zero-extended grid —
    q[y, x] = concat of x at (y-1..y, x-1..x) with zeros outside — turns
    each sample into ONE row gather of 4C channels instead of four
    C-channel gathers (36x smaller HLO than per-corner gathers; full
    dcnv2 backbones compile in minutes, not hours). XLA's TPU gather is
    the bandwidth bound either way (see PERF.md)."""
    b, h, w, c = x.shape
    ho, wo, _, k = y0p.shape[1:5]
    cg = c // dg
    flat = y0p * (w + 1) + x0p  # rows of the (H+1)*(W+1) patch grid
    cwx = cw.astype(x.dtype)

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
            jnp.einsum("bhwkqc,bhwkq->bhwkc", gq, cwx[:, :, :, g])
        )
    return (
        col_groups[0] if dg == 1
        else jnp.concatenate(col_groups, axis=-1)
    )  # (B, Ho, Wo, K, C)


def _onehot_plan(h, w, ho, wo, kh, kw, s, d, p, tile, margin):
    """Static tiling plan for the windowed one-hot path.

    Output grid tiled (th, tw); each tile samples from a
    (hw_win, ww_win) window of the 1-padded input whose start rows/cols
    (wsy/wsx, python ints -> static slices) cover the tile's static
    receptive field plus ``margin`` pixels of offset headroom each side.
    """
    th = min(tile[0], ho)
    tw = min(tile[1], wo)
    ti = -(-ho // th)
    tj = -(-wo // tw)
    hw_win = min((th - 1) * s + (kh - 1) * d + 2 + 2 * margin, h + 2)
    ww_win = min((tw - 1) * s + (kw - 1) * d + 2 + 2 * margin, w + 2)
    wsy = [
        min(max(i * th * s - p + 1 - margin, 0), h + 2 - hw_win)
        for i in range(ti)
    ]
    wsx = [
        min(max(j * tw * s - p + 1 - margin, 0), w + 2 - ww_win)
        for j in range(tj)
    ]
    return th, tw, ti, tj, hw_win, ww_win, wsy, wsx


def _tile_samples(t, th, tw, ti, tj):
    """(B, Ho, Wo, ...) -> (B, Ti, Tj, Th, Tw, ...): pad the output grid
    to tile multiples (padded samples carry zero weight) and regroup."""
    b, ho, wo = t.shape[:3]
    rest = t.shape[3:]
    pad = [(0, 0), (0, ti * th - ho), (0, tj * tw - wo)] + [
        (0, 0)
    ] * len(rest)
    t = jnp.pad(t, pad)
    t = t.reshape((b, ti, th, tj, tw) + rest)
    return jnp.moveaxis(t, 3, 2)  # (B, Ti, Tj, Th, Tw, ...)


def _corner_layout(y0p, x0p, cw, plan):
    """Window-relative flattened corner indices + escape predicate.

    Returns s_idx (B, Ti, Tj, Th, Tw, dg, K, 4) int32 (clipped into the
    window for safety), cw tiled to the same leading shape, and the
    scalar ``escaped``: whether ANY corner with nonzero weight falls
    outside its tile window (in which case only the gather path is
    exact)."""
    th, tw, ti, tj, hw_win, ww_win, wsy, wsx = plan
    y0t = _tile_samples(y0p, th, tw, ti, tj)
    x0t = _tile_samples(x0p, th, tw, ti, tj)
    cwt = _tile_samples(cw, th, tw, ti, tj)

    wsy_a = jnp.asarray(wsy, jnp.int32)[None, :, None, None, None, None, None]
    wsx_a = jnp.asarray(wsx, jnp.int32)[None, None, :, None, None, None, None]
    ry0 = y0t - wsy_a
    rx0 = x0t - wsx_a
    # corner order (tl, tr, bl, br) matches cw's last axis
    ry = jnp.stack([ry0, ry0, ry0 + 1, ry0 + 1], axis=-1)
    rx = jnp.stack([rx0, rx0 + 1, rx0, rx0 + 1], axis=-1)
    oob = (ry < 0) | (ry >= hw_win) | (rx < 0) | (rx >= ww_win)
    # FORWARD-exactness predicate: a corner with exactly-zero bilinear
    # weight may sit outside the window without escaping (its clipped
    # position contributes 0). Gradient caveat: d(weight)/d(offset) is
    # nonzero at weight == 0, so the offset gradient through such a
    # corner reads the clipped (wrong) pixel in the onehot branch —
    # only reachable when an exact-integer offset lands a corner
    # precisely at window-edge + margin (measure-zero; zero-init
    # offsets keep corners well inside). Extend the predicate to
    # weight-gradient-carrying corners if bitwise gradient parity with
    # gather is ever required.
    escaped = jnp.any(oob & (cwt != 0))
    s_idx = (
        jnp.clip(ry, 0, hw_win - 1) * ww_win + jnp.clip(rx, 0, ww_win - 1)
    )
    return s_idx, cwt, escaped


def _contract_weights_tiled(col, weights, groups, k):
    """Tiled-form weight contraction: (B, Ti, Tj, Th*Tw*K, C) im2col
    tiles x (kh, kw, Cin/groups, O) HWIO -> (B, Ti, Tj, Th*Tw, O).

    Contracting BEFORE the spatial reassembly keeps the K*C-wide col
    tensor in tiled layout (where XLA can fuse it with the producing
    interpolation matmul) — the tensor that round-trips HBM for the
    reassembly copy is the O-wide output, 9x smaller. Grouped weights
    get the same 128-wide block-diagonal supergroup treatment as
    _contract_weights."""
    from .groupconv import (
        expand_supergroup_matmul_weights,
        supergroup_plan,
    )

    b, ti, tj, rows, c = col.shape
    p = rows // k
    cin_g, o = weights.shape[2], weights.shape[3]
    colk = col.reshape(b, ti, tj, p, k, c)
    if groups == 1:
        return jnp.einsum(
            "btjpkc,kco->btjpo",
            colk,
            weights.reshape(k, cin_g, o),
            preferred_element_type=jnp.float32,
        )
    og = o // groups
    w_g = weights.reshape(k, cin_g, groups, og)
    g = groups
    plan = supergroup_plan(groups, cin_g, og)
    if plan is not None:
        m, g = plan
        w_g = expand_supergroup_matmul_weights(w_g, groups, m)
    col_g = colk.reshape(b, ti, tj, p, k, g, c // g)
    out = jnp.einsum(
        "btjpkgc,kcgo->btjpgo",
        col_g,
        w_g,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, ti, tj, p, o)


def _onehot_cols(x, s_idx, cwt, dg, plan):
    """Windowed one-hot im2col: per tile, col = onehot @ window, where
    onehot (B, Ti, Tj, Th*Tw*K, S) holds each sample's 4 bilinear corner
    weights at its corners' window positions. The contraction runs on
    the MXU; total HBM traffic is the windows + the onehot matrix — no
    gather ops at all."""
    b, h, w, c = x.shape
    th, tw, ti, tj, hw_win, ww_win, wsy, wsx = plan
    k = s_idx.shape[6]
    cg = c // dg
    sdim = hw_win * ww_win
    rows = th * tw * k

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xwin = jnp.stack(
        [
            jnp.stack(
                [
                    xp[:, sy:sy + hw_win, sx:sx + ww_win]
                    for sx in wsx
                ],
                axis=1,
            )
            for sy in wsy
        ],
        axis=1,
    )  # (B, Ti, Tj, Hw, Ww, C)
    xwin = xwin.reshape(b, ti, tj, sdim, c)

    iota = jnp.arange(sdim, dtype=jnp.int32)
    cwx = cwt.astype(x.dtype)
    col_groups = []
    for g in range(dg):
        # (B, Ti, Tj, Th, Tw, K, 4) for this deformable group
        sg = s_idx[:, :, :, :, :, g]
        wg = cwx[:, :, :, :, :, g]
        onehot = jnp.zeros(
            (b, ti, tj, th, tw, k, sdim), dtype=x.dtype
        )
        for corner in range(4):
            onehot = onehot + wg[..., corner, None] * (
                sg[..., corner, None] == iota
            ).astype(x.dtype)
        onehot = onehot.reshape(b, ti, tj, rows, sdim)
        colg = jnp.einsum(
            "btjrs,btjsc->btjrc",
            onehot,
            xwin[..., g * cg:(g + 1) * cg],
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        col_groups.append(colg)
    return (
        col_groups[0] if dg == 1
        else jnp.concatenate(col_groups, axis=-1)
    )  # (B, Ti, Tj, rows, C) tiled layout, rows = (Th, Tw, K)


def _onehot_out(x, s_idx, cwt, dg, plan, ho, wo, weights, groups):
    """One-hot sampling + weight contraction, reassembled to
    (B, Ho, Wo, O) f32. The contraction happens in tiled layout
    (_contract_weights_tiled) so only the O-wide result pays the
    reassembly copy."""
    th, tw, ti, tj = plan[0], plan[1], plan[2], plan[3]
    k = s_idx.shape[6]
    col = _onehot_cols(x, s_idx, cwt, dg, plan)
    out = _contract_weights_tiled(col, weights, groups, k)
    b, o = out.shape[0], out.shape[-1]
    out = out.reshape(b, ti, tj, th, tw, o)
    out = jnp.moveaxis(out, 2, 3).reshape(b, ti * th, tj * tw, o)
    return out[:, :ho, :wo]


def deform_conv2d(x, offsets, mask, weights, strides=1, padding=1,
                  dilation=1, groups=1, deformable_groups=1,
                  mode: Optional[str] = None,
                  window_margin: Optional[int] = None,
                  tile: Tuple[int, int] = (8, 16)):
    """Functional modulated deformable conv (see module docstring).

    Args:
        x: (B, H, W, C)
        offsets: (B, Ho, Wo, dg*K*2) as (dy, dx) pairs
        mask: (B, Ho, Wo, dg*K) already sigmoided, or None (v1)
        weights: (kh, kw, C/groups, O) HWIO
        mode: 'gather' | 'onehot' | 'auto' | None (= process default)
        window_margin: offset headroom (pixels) of the onehot windows
            (None = process default; larger keeps 'auto' on the fast
            path for bigger trained offsets at ~linear window cost)
        tile: (rows, cols) output tile of the onehot path
    Returns (B, Ho, Wo, O).
    """
    mode = _DEFAULT_MODE if mode is None else mode
    if mode == "optimistic":
        # pure onehot program; the escape flags are sown separately by
        # DeformConv and acted on by the host (see module docstring)
        mode = "onehot"
    window_margin = (
        _DEFAULT_MARGIN if window_margin is None else window_margin
    )
    b, h, w, c = x.shape
    kh, kw, cin_g, o = weights.shape
    s, p, d = strides, padding, dilation
    dg = deformable_groups

    if mode == "gather":
        y0p, x0p, cw = _geometry(x, offsets, mask, kh, kw, s, p, d, dg)
        col = _gather_cols(x, y0p, x0p, cw, dg)
        return _contract_weights(col, weights, groups).astype(x.dtype)
    if mode not in ("onehot", "auto"):
        raise ValueError(f"unknown DCN mode {mode!r}")

    ho = (h + 2 * p - d * (kh - 1) - 1) // s + 1
    wo = (w + 2 * p - d * (kw - 1) - 1) // s + 1
    plan = _onehot_plan(h, w, ho, wo, kh, kw, s, d, p, tile, window_margin)

    # both cond branches take only the RAW inputs and recompute geometry
    # internally: precomputed index/weight tensors passed through a
    # lax.cond are materialized to HBM before the branch runs, which
    # blocks fusion and cost 35% e2e on dcnv2-R101 (measured; PERF.md)
    def onehot_path(ops):
        xx, offs, mk = ops
        y0p, x0p, cw = _geometry(xx, offs, mk, kh, kw, s, p, d, dg)
        s_idx, cwt, _ = _corner_layout(y0p, x0p, cw, plan)
        return _onehot_out(
            xx, s_idx, cwt, dg, plan, ho, wo, weights, groups
        )

    if mode == "onehot":
        return onehot_path((x, offsets, mask)).astype(x.dtype)

    def _escaped(xx, offs, mk):
        # standalone escape predicate: recomputes the (cheap) geometry
        # and reduces — XLA fuses the check into one pass over offsets
        y0p, x0p, cw = _geometry(xx, offs, mk, kh, kw, s, p, d, dg)
        _, _, escaped = _corner_layout(y0p, x0p, cw, plan)
        return escaped

    # custom VJP: autodiff residuals that cross a lax.cond boundary are
    # materialized to HBM — the f32 one-hot corner matrices alone are
    # ~13 GB for ONE stage-2-sized layer, OOMing its backward (and
    # jax.checkpoint does not help: the rematerialized forward still
    # linearizes through the cond, recreating the same residuals). So
    # save only the raw inputs, and run the selected branch's entire
    # recompute-forward + vjp INSIDE one cond branch body, where buffer
    # liveness is local and XLA schedules it like the pure lowering.
    def path_w(path):
        def f(ops):
            xx, offs, mk, wts = ops
            y0p, x0p, cw = _geometry(xx, offs, mk, kh, kw, s, p, d, dg)
            if path == "gather":
                col = _gather_cols(xx, y0p, x0p, cw, dg)
                return _contract_weights(col, wts, groups)
            s_idx, cwt, _ = _corner_layout(y0p, x0p, cw, plan)
            return _onehot_out(
                xx, s_idx, cwt, dg, plan, ho, wo, wts, groups
            )
        return f

    @jax.custom_vjp
    def sample_auto(ops):
        escaped = _escaped(ops[0], ops[1], ops[2])
        return jax.lax.cond(
            escaped, path_w("gather"), path_w("onehot"), ops
        )

    def sample_auto_fwd(ops):
        return sample_auto(ops), ops

    def sample_auto_bwd(ops, g):
        escaped = _escaped(ops[0], ops[1], ops[2])

        def branch_bwd(path):
            def f(args):
                ops_, g_ = args
                _, vjp = jax.vjp(path_w(path), ops_)
                return vjp(g_)[0]
            return f

        return (jax.lax.cond(
            escaped, branch_bwd("gather"), branch_bwd("onehot"), (ops, g)
        ),)

    sample_auto.defvjp(sample_auto_fwd, sample_auto_bwd)
    out = sample_auto((x, offsets, mask, weights))
    return out.astype(x.dtype)


class DeformConv(nn.Module):
    """Flax module: offset conv (zero-init, like DFConv2d) + deformable
    sampling + weight contraction. ``modulated`` selects v2; ``mode``
    picks the sampling lowering (None = process default, see
    set_default_dcn_mode / cfg.TPU.DCN_MODE)."""

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
    mode: Optional[str] = None
    window_margin: Optional[int] = None

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
        if resolve_dcn_mode(self.mode) == "optimistic":
            self.sow(
                "intermediates",
                "dcn_escaped",
                dcn_escape_flags(
                    x, offsets, mask,
                    kernel_size=self.kernel_size, strides=self.strides,
                    padding=self.padding, dilation=self.dilation,
                    deformable_groups=dg,
                    window_margin=self.window_margin,
                ),
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
            deformable_groups=dg, mode=self.mode,
            window_margin=self.window_margin,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            out = out + bias.astype(out.dtype)
        return out
