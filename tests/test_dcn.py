"""Deformable conv tests: zero offsets must reduce to a regular conv;
integer offsets must equal a shifted conv; autodiff stays finite."""

import numpy as np
import jax
import jax.numpy as jnp

from paa_tpu.ops.dcn import DeformConv, deform_conv2d


def regular_conv_ref(x, w, strides=1, padding=1, dilation=1):
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(strides, strides),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_zero_offsets_match_regular_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(2, 9, 11, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 4)).astype(np.float32))
    offsets = jnp.zeros((2, 9, 11, 18))
    out = deform_conv2d(x, offsets, None, w)
    ref = regular_conv_ref(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_zero_offsets_strided():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(size=(1, 10, 12, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
    offsets = jnp.zeros((1, 5, 6, 18))
    out = deform_conv2d(x, offsets, None, w, strides=2)
    ref = regular_conv_ref(x, w, strides=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_integer_offset_shifts_sampling():
    # constant offset (dy=0, dx=1) equals convolving an x-shifted input
    rng = np.random.RandomState(2)
    x = np.zeros((1, 8, 8, 2), np.float32)
    x[:, 2:6, 2:6] = rng.normal(size=(1, 4, 4, 2))
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 3)).astype(np.float32))
    offsets = np.zeros((1, 8, 8, 9, 2), np.float32)
    offsets[..., 1] = 1.0  # dx = +1 for every kernel position
    out = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets.reshape(1, 8, 8, 18)), None, w
    )
    shifted = np.zeros_like(x)
    shifted[:, :, :-1] = x[:, :, 1:]
    ref = regular_conv_ref(jnp.asarray(shifted), w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_modulation_scales_output():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 2)).astype(np.float32))
    offsets = jnp.zeros((1, 6, 6, 18))
    mask_half = jnp.full((1, 6, 6, 9), 0.5)
    out = deform_conv2d(x, offsets, mask_half, w)
    ref = regular_conv_ref(x, w)
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_module_init_and_grad():
    m = DeformConv(features=6, modulated=True, deformable_groups=2)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    # zero-init offset conv: modulated dcn at init = 0.5 * regular conv
    out = m.apply(variables, x)
    ref = regular_conv_ref(x, variables["params"]["kernel"])
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss(v):
        return (m.apply(v, x) ** 2).sum()

    g = jax.grad(loss)(variables)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    # offset conv receives gradient (through bilinear sampling)
    off_g = g["params"]["offset"]["kernel"]
    assert np.abs(np.asarray(off_g)).sum() > 0


def test_grouped_dcn():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
    offsets = jnp.zeros((1, 6, 6, 18))
    out = deform_conv2d(x, offsets, None, w, groups=2)
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=2,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
