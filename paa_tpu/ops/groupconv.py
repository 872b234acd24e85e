"""MXU supergroup reformulation of grouped convolutions.

ResNeXt's bottleneck 3x3s (reference paa_core/modeling/backbone/resnet.py:98-101
via NUM_GROUPS/WIDTH_PER_GROUP, e.g. 64 groups x 4 channels for
X-101-64x4d) are hostile to the 128x128 MXU: each group's matmul has
K = 9*4 = 36 and N = 4, so the systolic array runs at ~3% lane
utilization. The fix is EXACT: merge ``m`` consecutive groups into one
"supergroup" whose kernel is block-diagonal (zeros off the diagonal
blocks), so the conv runs with ``feature_group_count = G/m`` and
N = m*width ≈ 128 — full MXU tiles at ``m``x the FLOPs, where the extra
FLOPs multiply structural zeros.

Measured on v5e (tools/bench_groupconv.py, B=8, bf16, X-101-64x4d
conv2 shapes): 3.9x (stage2, 200x336 c256), 3.9x (stage3), 2.1x
(stage4), 1.8x (stage5) vs the plain grouped conv — and faster than the
fully-dense block-diagonal (G x FLOPs) everywhere past stage2.

Exactness: contributions off the diagonal blocks are ``0 * x``
products; with f32 accumulation the result differs from the grouped
conv only by sum-order rounding (bit-exact in f64, ~1e-6 rel in f32;
tests/test_groupconv.py). Gradients are exact too: autodiff flows
through the (linear) block-diagonal expansion, so off-diagonal kernel
slots receive no gradient and the grouped-kernel gradient matches the
plain lowering.

Parameters stay in the reference's grouped layout (kh, kw, Cin/G, O),
so torch import and checkpoints are oblivious to the lowering.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

# MXU lane width: target supergroup output width.
DEFAULT_SUPER_WIDTH = 128


def supergroup_plan(
    groups: int, cin_g: int, out_g: int,
    super_width: int = DEFAULT_SUPER_WIDTH,
) -> Optional[Tuple[int, int]]:
    """(m, new_feature_group_count) if merging helps, else None.

    Gate (from the measured A/B): merging wins when the per-group output
    width is a fraction of the 128-lane tile and the group is not
    depthwise (depthwise convs — cin_g == 1, as in MobileNet/FBNet —
    lower to efficient channel-wise VPU ops already, and block-diag
    expansion would cost m x for nothing).
    """
    if groups < 2 or cin_g < 2 or out_g < 2:
        return None
    if out_g >= super_width:
        return None
    m = max(1, min(super_width // max(cin_g, out_g), groups))
    while groups % m:
        m -= 1
    if m < 2:
        return None
    return m, groups // m


def expand_supergroup_kernel(w: jnp.ndarray, groups: int, m: int):
    """Grouped HWIO kernel (kh, kw, Cin/G, O) -> block-diagonal kernel
    (kh, kw, m*Cin/G, O) for feature_group_count = G/m.

    Supergroup sg covers original groups sg*m .. sg*m+m-1 (consecutive,
    matching lax's contiguous channel grouping). Entry
    [ky, kx, (a_in, c), o=(sg, a_out, og)] = w[ky, kx, c, g*og+..] iff
    a_in == a_out.
    """
    kh, kw, cin_g, o = w.shape
    og = o // groups
    gp = groups // m
    w6 = w.reshape(kh, kw, cin_g, gp, m, og)
    eye = jnp.eye(m, dtype=w.dtype)
    # (kh, kw, a_in, cin_g, gp, a_out, og); diag over (a_in, a_out)
    wbd = jnp.einsum("xycgmo,nm->xyncgmo", w6, eye)
    return wbd.reshape(kh, kw, m * cin_g, o)


def expand_supergroup_matmul_weights(w: jnp.ndarray, groups: int, m: int):
    """(K, Cin/G, G, out_g) grouped matmul weights (dcn._contract_weights
    layout) -> (K, m*Cin/G, G/m, m*out_g) block-diagonal weights for the
    supergrouped einsum."""
    k, cin_g, g, og = w.shape
    gp = g // m
    w5 = w.reshape(k, cin_g, gp, m, og)
    eye = jnp.eye(m, dtype=w.dtype)
    # (k, a_in, cin_g, gp, a_out, og)
    wbd = jnp.einsum("kcgmo,nm->kncgmo", w5, eye)
    return wbd.reshape(k, m * cin_g, gp, m * og)
