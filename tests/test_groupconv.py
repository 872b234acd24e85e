"""Exactness of the supergroup block-diagonal grouped-conv lowering.

The ResNeXt bottleneck 3x3s (reference paa_core/modeling/backbone/
resnet.py:98-101, NUM_GROUPS/WIDTH_PER_GROUP) are lowered as 128-wide
block-diagonal supergroups on TPU (paa_tpu/ops/groupconv.py). The
reformulation must be EXACT up to float sum-order: the extra
contractions multiply structural zeros. These tests pin:

- forward equality vs the plain grouped lowering at `highest` matmul
  precision (true f32 accumulation; JAX's default matmul precision
  truncates operands to bf16, which would mask real bugs behind large
  tolerances),
- gradient equality for input and the GROUPED kernel (off-diagonal
  blocks of the expanded kernel receive zero gradient by construction),
- the plan gate: depthwise and already-wide groups decline,
- SupergroupConv (modeling/layers.py) param-tree compatibility with
  nn.Conv (same names/shapes, so checkpoints and torch import are
  oblivious to the lowering).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paa_tpu.modeling.layers import conv
from paa_tpu.ops.groupconv import (
    expand_supergroup_kernel,
    expand_supergroup_matmul_weights,
    supergroup_plan,
)


def grouped_ref(x, w, groups, strides=1, padding=1):
    return jax.lax.conv_general_dilated(
        x, w, (strides, strides), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=jax.lax.Precision.HIGHEST,
    )


@pytest.mark.parametrize(
    "c,groups,out",
    [
        (256, 64, 256),   # X-101-64x4d stage2 (4-wide groups)
        (512, 32, 512),   # X-101-32x8d stage3 (8-wide)
        (64, 8, 128),     # uneven in/out widths
        (96, 3, 48),      # groups not a power of two
    ],
)
def test_supergroup_conv_forward_exact(c, groups, out):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 14, c).astype(np.float32))
    w = jnp.asarray(
        (0.1 * rng.randn(3, 3, c // groups, out)).astype(np.float32)
    )
    ref = grouped_ref(x, w, groups)

    plan = supergroup_plan(groups, c // groups, out // groups)
    assert plan is not None
    m, gp = plan
    assert groups % m == 0 and m * gp == groups
    wbd = expand_supergroup_kernel(w, groups, m)
    got = jax.lax.conv_general_dilated(
        x, wbd, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=gp,
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(
        np.array(got), np.array(ref), rtol=1e-5, atol=1e-5
    )


def test_supergroup_matmul_weights_exact():
    rng = np.random.RandomState(1)
    k, cin_g, groups, og = 9, 4, 16, 4
    col = jnp.asarray(
        rng.randn(2, 6, 7, k, groups * cin_g).astype(np.float32)
    )
    w = jnp.asarray(0.1 * rng.randn(k, cin_g, groups, og).astype(np.float32))
    ref = jnp.einsum(
        "bhwkgc,kcgo->bhwgo",
        col.reshape(2, 6, 7, k, groups, cin_g), w,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(2, 6, 7, groups * og)

    plan = supergroup_plan(groups, cin_g, og)
    assert plan is not None
    m, gp = plan
    wbd = expand_supergroup_matmul_weights(w, groups, m)
    got = jnp.einsum(
        "bhwkgc,kcgo->bhwgo",
        col.reshape(2, 6, 7, k, gp, m * cin_g), wbd,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(2, 6, 7, groups * og)
    np.testing.assert_allclose(
        np.array(got), np.array(ref), rtol=1e-5, atol=1e-5
    )


def test_supergroup_gradients_exact():
    """d/d(input) and d/d(grouped kernel) match the plain lowering; the
    expansion is linear so off-diagonal slots contribute nothing."""
    rng = np.random.RandomState(2)
    c, groups, out = 64, 16, 64
    x = jnp.asarray(rng.randn(1, 6, 8, c).astype(np.float32))
    w = jnp.asarray(
        (0.1 * rng.randn(3, 3, c // groups, out)).astype(np.float32)
    )
    m, gp = supergroup_plan(groups, c // groups, out // groups)

    def loss_ref(x, w):
        return (grouped_ref(x, w, groups) ** 2).sum()

    def loss_sg(x, w):
        wbd = expand_supergroup_kernel(w, groups, m)
        y = jax.lax.conv_general_dilated(
            x, wbd, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=gp,
            precision=jax.lax.Precision.HIGHEST,
        )
        return (y ** 2).sum()

    gx_ref, gw_ref = jax.grad(loss_ref, (0, 1))(x, w)
    gx_sg, gw_sg = jax.grad(loss_sg, (0, 1))(x, w)
    np.testing.assert_allclose(
        np.array(gx_sg), np.array(gx_ref), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.array(gw_sg), np.array(gw_ref), rtol=1e-4, atol=1e-4
    )


def test_plan_gate():
    # depthwise (MobileNet/FBNet): declined
    assert supergroup_plan(64, 1, 1) is None
    # group out width already >= 128: declined
    assert supergroup_plan(4, 128, 128) is None
    # single group: declined
    assert supergroup_plan(1, 256, 256) is None
    # ResNeXt shapes: merged to ~128-wide supergroups
    assert supergroup_plan(64, 4, 4) == (32, 2)
    assert supergroup_plan(64, 8, 8) == (16, 4)
    assert supergroup_plan(32, 8, 8) == (16, 2)
    assert supergroup_plan(64, 16, 16) == (8, 8)
    assert supergroup_plan(64, 32, 32) == (4, 16)
    # 32x8d stage5: 64-wide groups still merge in pairs
    assert supergroup_plan(32, 64, 64) == (2, 16)


def test_supergroup_conv_module_param_compat():
    """conv(groups=...) keeps the nn.Conv param tree (kernel/bias names
    and grouped shapes) and computes the same function."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 64).astype(np.float32))

    mod_sg = conv(64, 3, padding=1, groups=16, use_bias=True, name="c")
    mod_ref = conv(
        64, 3, padding=1, groups=16, use_bias=True, name="c",
        supergroup=False,
    )
    v = mod_sg.init(jax.random.PRNGKey(0), x)
    assert v["params"]["kernel"].shape == (3, 3, 4, 64)
    assert v["params"]["bias"].shape == (64,)
    y_sg = mod_sg.apply(v, x)
    y_ref = mod_ref.apply(v, x)
    np.testing.assert_allclose(
        np.array(y_sg), np.array(y_ref), rtol=2e-2, atol=2e-2
    )  # default matmul precision (bf16 operands) dominates the diff


def test_depthwise_falls_back():
    """MobileNet-style depthwise conv goes through the plain lowering
    (plan declines inside SupergroupConv)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 32).astype(np.float32))
    mod = conv(32, 3, padding=1, groups=32, name="dw")
    v = mod.init(jax.random.PRNGKey(0), x)
    assert v["params"]["kernel"].shape == (3, 3, 1, 32)
    y = mod.apply(v, x)
    assert y.shape == (1, 8, 8, 32)
