"""ROIAlign / ROIPool tests: analytic cases on constant and linear
feature maps, level mapping, and gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp

from paa_tpu.ops.roi_align import (
    fpn_level_for_rois,
    multilevel_roi_align,
    roi_align,
    roi_pool,
)


def test_roi_align_constant_map():
    feat = jnp.full((1, 16, 16, 3), 5.0)
    rois = jnp.asarray([[2.0, 2.0, 10.0, 10.0]])
    out = roi_align(feat, rois, jnp.asarray([0]), (7, 7), 1.0, 2)
    assert out.shape == (1, 7, 7, 3)
    np.testing.assert_allclose(np.asarray(out), 5.0, rtol=1e-5)


def test_roi_align_linear_map_exact():
    # f(y, x) = x: bilinear sampling of a linear ramp is exact, so each
    # output bin equals the average x of its sample points.
    h = w = 16
    xs = np.arange(w, dtype=np.float32)
    feat = jnp.asarray(np.tile(xs[None, :, None], (h, 1, 1))[None])
    roi = [4.0, 4.0, 12.0, 12.0]
    out = roi_align(feat, jnp.asarray([roi]), jnp.asarray([0]),
                    (4, 4), 1.0, 2)
    bin_w = (12 - 4) / 4
    expected_cols = 4.0 + (np.arange(4) + 0.5) * bin_w
    np.testing.assert_allclose(
        np.asarray(out)[0, 0, :, 0], expected_cols, rtol=1e-5
    )


def test_roi_align_spatial_scale():
    xs = np.arange(32, dtype=np.float32)
    feat = jnp.asarray(np.tile(xs[None, :, None], (32, 1, 1))[None])
    # roi in input coords, feature at 1/4 resolution
    roi = [16.0, 16.0, 48.0, 48.0]
    out = roi_align(feat, jnp.asarray([roi]), jnp.asarray([0]),
                    (2, 2), 0.25, 2)
    # scaled roi = [4, 4, 12, 12]; columns at 4 + (i+.5)*4... bin_w=4
    expected = 4.0 + (np.arange(2) + 0.5) * 4.0
    np.testing.assert_allclose(
        np.asarray(out)[0, 0, :, 0], expected, rtol=1e-5
    )


def test_roi_pool_max():
    feat = np.zeros((1, 8, 8, 1), np.float32)
    feat[0, 2, 3, 0] = 9.0
    out = roi_pool(jnp.asarray(feat), jnp.asarray([[0.0, 0.0, 7.0, 7.0]]),
                   jnp.asarray([0]), (2, 2), 1.0)
    assert float(np.asarray(out).max()) == 9.0
    # the max lands in the top-left 4x4 bin
    assert float(np.asarray(out)[0, 0, 0, 0]) == 9.0


def test_level_mapping():
    rois = jnp.asarray(
        [
            [0, 0, 55, 55],      # ~56 -> level 2
            [0, 0, 111, 111],    # ~112 -> level 3
            [0, 0, 223, 223],    # ~224 -> level 4
            [0, 0, 447, 447],    # ~448 -> level 5
            [0, 0, 1000, 1000],  # clamped to 5
        ],
        dtype=jnp.float32,
    )
    lvl = np.asarray(fpn_level_for_rois(rois))
    np.testing.assert_array_equal(lvl, [0, 1, 2, 3, 3])


def test_multilevel_pool_selects_by_scale():
    # distinct constant value per level; the roi's level determines the
    # output value
    feats = [
        jnp.full((1, 64 // (2 ** i), 64 // (2 ** i), 1), float(i + 1))
        for i in range(4)
    ]
    # (for a 256x256 input: levels are 64, 32, 16, 8)
    rois = jnp.asarray(
        [[0, 0, 55, 55], [0, 0, 250, 250]], dtype=jnp.float32
    )
    lvl = np.asarray(fpn_level_for_rois(rois))
    np.testing.assert_array_equal(lvl, [0, 2])
    out = multilevel_roi_align(
        feats, rois, jnp.asarray([0, 0]), (2, 2)
    )
    np.testing.assert_allclose(np.asarray(out)[0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[1], 3.0, rtol=1e-5)


def test_roi_align_grad():
    feat = jnp.asarray(
        np.random.RandomState(0).rand(1, 8, 8, 2).astype(np.float32)
    )

    def f(x):
        return roi_align(
            x, jnp.asarray([[1.0, 1.0, 6.0, 6.0]]), jnp.asarray([0]),
            (3, 3), 1.0, 2,
        ).sum()

    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
