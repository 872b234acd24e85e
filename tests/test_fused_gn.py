"""Fused GroupNorm+ReLU Pallas kernel (ops/fused_gn.py) vs the flax
GroupNorm spec, in interpret mode on CPU. The perf claim (one HBM pass
instead of two) is measured on hardware; here we pin numerics, the
custom-VJP gradients, shape edge cases, and param-tree compatibility of
the GroupNorm32 fused mode."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from paa_tpu.ops.fused_gn import (
    _CH,
    _gn_relu_reference,
    fused_group_norm_relu,
)

C = 256


def _ref_flax(x, s, b, relu=True):
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    out = gn.apply({"params": {"scale": s, "bias": b}}, x)
    return nn.relu(out) if relu else out


def _rand(shape, dtype, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.normal(0, 1, shape), dtype)
    s = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.2, (C,)), jnp.float32)
    return x, s, b


def test_kernel_matches_flax_f32():
    # hw = 1280: kernel path with an edge (partial) last chunk
    x, s, b = _rand((2, 40, 32, C), jnp.float32)
    got = fused_group_norm_relu(x, s, b)
    want = _ref_flax(x, s, b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_kernel_matches_flax_exact_chunks():
    x, s, b = _rand((1, 32, 32, C), jnp.float32, seed=1)  # hw == _CH
    assert x.shape[1] * x.shape[2] == _CH
    got = fused_group_norm_relu(x, s, b)
    want = _ref_flax(x, s, b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_kernel_matches_flax_bf16():
    x, s, b = _rand((2, 41, 33, C), jnp.bfloat16, seed=2)
    got = fused_group_norm_relu(x, s, b)
    want = _ref_flax(x, s, b)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.02)  # bf16 output rounding


def test_small_and_odd_shapes_fall_back():
    # hw < one chunk, and C not a lane multiple: jnp reference path
    for shape in [(1, 7, 11, C), (1, 40, 32, 96)]:
        cc = shape[-1]
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
        s = jnp.asarray(rng.uniform(0.5, 1.5, (cc,)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.2, (cc,)), jnp.float32)
        got = fused_group_norm_relu(x, s, b)
        gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
        want = nn.relu(
            gn.apply({"params": {"scale": s, "bias": b}}, x))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_no_relu_mode():
    x, s, b = _rand((1, 40, 32, C), jnp.float32, seed=4)
    got = fused_group_norm_relu(x, s, b, relu=False)
    want = _ref_flax(x, s, b, relu=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    """custom_vjp backward == jax.grad of the jnp reference (it IS the
    reference vjp — this pins the wiring, incl. scale/bias grads)."""
    x, s, b = _rand((1, 36, 32, C), jnp.float32, seed=5)

    def f_fused(xx, ss, bb):
        return fused_group_norm_relu(xx, ss, bb).sum()

    def f_ref(xx, ss, bb):
        return _gn_relu_reference(xx, ss, bb, 32, 1e-5, True).sum()

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, s, b)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, s, b)
    for a, e in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(e))


def test_groupnorm32_fused_param_tree_identical():
    """GroupNorm32(fused_relu=True) must create the exact same params
    (gn/scale, gn/bias) so checkpoints and the torch importer are
    mode-oblivious — and match the flax output numerically."""
    from paa_tpu.modeling.layers import GroupNorm32

    x, s, b = _rand((1, 40, 32, C), jnp.float32, seed=6)
    plain = GroupNorm32(C)
    fused = GroupNorm32(C, fused_relu=True)
    vp = plain.init(jax.random.PRNGKey(0), x)
    vf = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vp) == (
        jax.tree_util.tree_structure(vf))
    params = {"gn": {"scale": s, "bias": b}}
    out_f = fused.apply({"params": params}, x)
    out_p = nn.relu(plain.apply({"params": params}, x))
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_p), rtol=1e-5, atol=1e-5)


def test_tower_fused_flag_equivalence():
    """ConvTower(fused_gn=True) == ConvTower() numerically with shared
    params (the fused flag must change no semantics, only fusion)."""
    from paa_tpu.modeling.paa_head import ConvTower

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.normal(0, 1, (1, 40, 32, C)), jnp.float32)
    plain = ConvTower(C, num_convs=2)
    fused = ConvTower(C, num_convs=2, fused_gn=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    out_p = plain.apply(variables, x)
    out_f = fused.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_p), rtol=1e-4, atol=1e-4)
