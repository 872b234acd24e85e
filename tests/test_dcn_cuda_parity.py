"""Deformable-conv parity vs a numpy transcription of the reference CUDA
kernel.

The transcription below is written DIRECTLY from the device loops in
paa_core/csrc/cuda/deform_conv_kernel_cuda.cu:
- (modulated_)deformable_im2col_gpu_kernel (:198-250 v1, :578-641 v2):
  sampling point h_im = h_col*stride - pad + i*dilation + offset_h, the
  (-1, H) x (-1, W) boundary gate, bilinear with per-corner zeroing
  (deformable_im2col_bilinear :93-124), offset channel layout
  (dg, 2*(i*kw+j)+{h,w}), mask layout (dg, i*kw+j).
- the GEMM the host code runs on the columns (deform_conv_cuda.cu:
  output = weight.view(group, O/g, C/g*k) @ col.view(group, C/g*k, hw)).

It is independent of paa_tpu/ops/dcn.py (loops + NCHW vs gathers + NHWC
einsum), so a shared misreading cannot hide. Covers fractional offsets,
stride/dilation/padding, groups x deformable_groups, v1 (no mask) and v2
(modulated), out-of-bounds samples, and gradients vs numeric
differentiation. VERDICT r2 item 2a.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paa_tpu.ops.dcn import deform_conv2d


def bilinear_cuda(img, h, w):
    """deformable_im2col_bilinear (deform_conv_kernel_cuda.cu:93-124):
    per-corner zeroing outside [0, H) x [0, W)."""
    H, W = img.shape
    h_low = int(np.floor(h))
    w_low = int(np.floor(w))
    h_high = h_low + 1
    w_high = w_low + 1
    lh = h - h_low
    lw = w - w_low
    hh, hw = 1 - lh, 1 - lw
    v1 = img[h_low, w_low] if (h_low >= 0 and w_low >= 0) else 0.0
    v2 = img[h_low, w_high] if (h_low >= 0 and w_high <= W - 1) else 0.0
    v3 = img[h_high, w_low] if (h_high <= H - 1 and w_low >= 0) else 0.0
    v4 = img[h_high, w_high] if (h_high <= H - 1 and w_high <= W - 1) else 0.0
    return hh * hw * v1 + hh * lw * v2 + lh * hw * v3 + lh * lw * v4


def ref_deform_conv_nchw(x, offsets, mask, weight, stride, pad, dil,
                         groups, dg):
    """Loop transcription of im2col kernel + grouped GEMM.

    x: (B, C, H, W); offsets: (B, dg*2*k, Ho, Wo) with channel
    dg_idx*2*k + 2*(i*kw+j) = offset_h, +1 = offset_w; mask: (B, dg*k,
    Ho, Wo) or None; weight: (O, C/groups, kh, kw).
    """
    B, C, H, W = x.shape
    O, C_g, kh, kw = weight.shape
    k = kh * kw
    ho = (H + 2 * pad - (dil * (kh - 1) + 1)) // stride + 1
    wo = (W + 2 * pad - (dil * (kw - 1) + 1)) // stride + 1
    ch_per_dg = C // dg

    col = np.zeros((B, C * k, ho, wo), dtype=np.float64)
    for b in range(B):
        for c in range(C):
            dgi = c // ch_per_dg
            for i in range(kh):
                for j in range(kw):
                    for hc in range(ho):
                        for wc in range(wo):
                            off_h = offsets[
                                b, dgi * 2 * k + 2 * (i * kw + j), hc, wc]
                            off_w = offsets[
                                b, dgi * 2 * k + 2 * (i * kw + j) + 1,
                                hc, wc]
                            h_im = hc * stride - pad + i * dil + off_h
                            w_im = wc * stride - pad + j * dil + off_w
                            if -1 < h_im < H and -1 < w_im < W:
                                val = bilinear_cuda(x[b, c], h_im, w_im)
                            else:
                                val = 0.0
                            if mask is not None:
                                val = val * mask[b, dgi * k + i * kw + j,
                                                 hc, wc]
                            col[b, c * k + i * kw + j, hc, wc] = val

    out = np.zeros((B, O, ho, wo), dtype=np.float64)
    og = O // groups
    cgk = C_g * k
    w_g = weight.reshape(groups, og, cgk)
    col_g = col.reshape(B, groups, cgk, ho * wo)
    for b in range(B):
        for g in range(groups):
            out[b, g * og:(g + 1) * og] = (
                w_g[g] @ col_g[b, g]
            ).reshape(og, ho, wo)
    return out


def run_both(seed, B=1, C=4, H=6, W=7, O=4, ksize=3, stride=1, pad=1,
             dil=1, groups=1, dg=1, modulated=True, offset_scale=2.0,
             mode="auto", window_margin=None):
    rng = np.random.RandomState(seed)
    k = ksize * ksize
    ho = (H + 2 * pad - (dil * (ksize - 1) + 1)) // stride + 1
    wo = (W + 2 * pad - (dil * (ksize - 1) + 1)) // stride + 1

    x = rng.normal(0, 1, (B, C, H, W))
    offsets = rng.normal(0, offset_scale, (B, dg * 2 * k, ho, wo))
    mask = rng.uniform(0.1, 1.0, (B, dg * k, ho, wo)) if modulated else None
    weight = rng.normal(0, 0.2, (O, C // groups, ksize, ksize))

    ref = ref_deform_conv_nchw(
        x, offsets, mask, weight, stride, pad, dil, groups, dg)

    # ours: NHWC; offsets (B, Ho, Wo, dg*k*2) as interleaved (dy, dx)
    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)), jnp.float32)
    off_j = jnp.asarray(np.transpose(offsets, (0, 2, 3, 1)), jnp.float32)
    mask_j = (
        jnp.asarray(np.transpose(mask, (0, 2, 3, 1)), jnp.float32)
        if modulated else None
    )
    w_j = jnp.asarray(np.transpose(weight, (2, 3, 1, 0)), jnp.float32)
    out = deform_conv2d(
        x_j, off_j, mask_j, w_j, strides=stride, padding=pad,
        dilation=dil, groups=groups, deformable_groups=dg, mode=mode,
        window_margin=window_margin)
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    return ref, ours


def assert_close(ref, ours, atol=2e-4):
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=atol)


# every case runs through both lowerings: 'gather' (quad-gather im2col)
# and 'auto' (windowed one-hot matmul with the runtime escape fallback)
MODES = ["gather", "auto"]


@pytest.mark.parametrize("mode", MODES)
def test_v2_fractional_offsets(mode):
    assert_close(*run_both(0, mode=mode))


@pytest.mark.parametrize("mode", MODES)
def test_v1_no_mask(mode):
    assert_close(*run_both(1, modulated=False, mode=mode))


@pytest.mark.parametrize("mode", MODES)
def test_stride2_pad2_dil2(mode):
    assert_close(*run_both(2, H=9, W=10, stride=2, pad=2, dil=2, mode=mode))


@pytest.mark.parametrize("mode", MODES)
def test_stride2_pad0(mode):
    assert_close(*run_both(3, H=8, W=8, pad=0, stride=2, mode=mode))


@pytest.mark.parametrize("mode", MODES)
def test_deformable_groups(mode):
    assert_close(*run_both(4, C=8, O=6, dg=2, mode=mode))


@pytest.mark.parametrize("mode", MODES)
def test_groups_and_deformable_groups(mode):
    assert_close(*run_both(5, C=8, O=8, groups=2, dg=2, mode=mode))


@pytest.mark.parametrize("mode", MODES)
def test_groups4_dg4(mode):
    assert_close(*run_both(6, C=16, O=16, groups=4, dg=4, B=2, mode=mode))


@pytest.mark.parametrize("mode", MODES)
def test_large_out_of_bounds_offsets(mode):
    """Offsets big enough to push many samples past the (-1, H) gate —
    'auto' must detect the window escapes and fall back to gather."""
    assert_close(*run_both(7, offset_scale=8.0, mode=mode))


@pytest.mark.parametrize("mode", MODES)
def test_kernel5(mode):
    assert_close(*run_both(8, ksize=5, pad=2, H=8, W=8, mode=mode))


@pytest.mark.parametrize("mode", MODES)
def test_batch3(mode):
    assert_close(*run_both(9, B=3, mode=mode))


@pytest.mark.parametrize("mode", MODES + ["onehot"])
def test_multi_tile_small_offsets(mode):
    """Feature map spanning several (8, 16) output tiles with offsets
    inside the default window margin: pure 'onehot' is exact here (no
    escapes), and tile/window bookkeeping must line up across interior
    and edge tiles."""
    assert_close(*run_both(10, H=26, W=40, offset_scale=0.5, mode=mode))


@pytest.mark.parametrize("mode", MODES + ["onehot"])
def test_multi_tile_stride2(mode):
    assert_close(
        *run_both(12, H=40, W=40, stride=2, offset_scale=0.5, mode=mode))


@pytest.mark.parametrize("mode", MODES + ["onehot"])
def test_resnext_shaped_groups(mode):
    """ResNeXt-style DCN: many small conv groups (X-101-64x4d puts the
    modulated DCN on the 64-group bottleneck conv2), one deformable
    group, multi-tile output."""
    assert_close(*run_both(
        13, C=32, O=32, groups=8, dg=1, H=20, W=24, offset_scale=0.5,
        mode=mode))


def test_wide_margin_keeps_onehot_exact():
    """Offsets too large for the default margin but inside a widened
    window: pure 'onehot' with window_margin=8 must stay exact (the
    cfg.TPU.DCN_WINDOW_MARGIN escape hatch for big trained offsets)."""
    assert_close(*run_both(
        11, H=26, W=40, offset_scale=1.5, mode="onehot", window_margin=8))


def test_auto_matches_gather_on_escape():
    """When any sample escapes its window, 'auto' must take the gather
    branch — outputs then match mode='gather' to reassociation noise
    (the cond branch compiles in a different fusion context, so exact
    bitwise equality is not guaranteed)."""
    _, a = run_both(7, offset_scale=8.0, mode="auto")
    _, g = run_both(7, offset_scale=8.0, mode="gather")
    np.testing.assert_allclose(a, g, rtol=1e-5, atol=1e-6)


@pytest.fixture
def x64():
    """Central finite differences need f64: in f32 the eps=1e-4 secant of
    a sum over thousands of terms is rounding noise."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize("mode", ["gather", "onehot", "auto"])
@pytest.mark.parametrize("wrt", ["x", "offsets", "mask", "weights"])
def test_gradients_vs_numeric(wrt, mode, x64):
    """jax.grad of our deform_conv2d vs central finite differences —
    the CUDA kernels' hand-written backward passes
    (deformable_col2im / _coord / weight, deform_conv_kernel_cuda.cu:
    282-473, 643-874) come for free from autodiff here, so numeric
    agreement on the same function is the right check."""
    rng = np.random.RandomState(11)
    B, C, H, W, O, ks, dg = 1, 4, 5, 6, 4, 3, 2
    k = ks * ks
    x = rng.normal(0, 1, (B, H, W, C)).astype(np.float64)
    # keep offsets away from integer grid points (bilinear kinks where
    # the derivative is discontinuous and numeric diff is invalid)
    off = (rng.uniform(0.1, 0.9, (B, H, W, dg * k * 2))
           + rng.randint(-2, 2, (B, H, W, dg * k * 2))).astype(np.float64)
    mask = rng.uniform(0.2, 1.0, (B, H, W, dg * k)).astype(np.float64)
    wts = rng.normal(0, 0.2, (ks, ks, C, O)).astype(np.float64)
    cot = rng.normal(0, 1, (B, H, W, O)).astype(np.float64)

    args = {"x": x, "offsets": off, "mask": mask, "weights": wts}

    def f(a):
        out = deform_conv2d(
            a["x"], a["offsets"], a["mask"], a["weights"],
            strides=1, padding=1, dilation=1, groups=1,
            deformable_groups=dg, mode=mode)
        return (out * cot).sum()

    g = jax.grad(lambda v: f({**args, wrt: v}))(jnp.asarray(args[wrt]))
    g = np.asarray(g)

    flat = args[wrt].reshape(-1)
    eps = 1e-4
    idxs = rng.choice(flat.size, size=12, replace=False)
    for i in idxs:
        fplus = flat.copy()
        fplus[i] += eps
        fminus = flat.copy()
        fminus[i] -= eps
        num = (
            float(f({**args, wrt: fplus.reshape(args[wrt].shape)}))
            - float(f({**args, wrt: fminus.reshape(args[wrt].shape)}))
        ) / (2 * eps)
        np.testing.assert_allclose(
            g.reshape(-1)[i], num, rtol=2e-2, atol=2e-3,
            err_msg=f"grad wrt {wrt} at flat index {i}")


@pytest.mark.parametrize("wrt", ["x", "offsets"])
def test_gradients_vs_numeric_auto_escape(wrt, x64):
    """auto's custom VJP on the GATHER branch: big offsets on an input
    larger than one onehot tile force the escape predicate true, so
    both sample_auto_bwd cond branches get finite-difference coverage
    (the small-shape test above can only exercise the onehot branch —
    its window covers the whole padded frame)."""
    from paa_tpu.ops import dcn

    rng = np.random.RandomState(13)
    B, C, H, W, O, ks, dg = 1, 4, 16, 24, 4, 3, 1
    k = ks * ks
    x = rng.normal(0, 1, (B, H, W, C)).astype(np.float64)
    off = (rng.uniform(0.1, 0.9, (B, H, W, dg * k * 2))
           + rng.randint(-7, 7, (B, H, W, dg * k * 2))).astype(np.float64)
    mask = rng.uniform(0.2, 1.0, (B, H, W, dg * k)).astype(np.float64)
    wts = rng.normal(0, 0.2, (ks, ks, C, O)).astype(np.float64)
    cot = rng.normal(0, 1, (B, H, W, O)).astype(np.float64)

    # the escape predicate must actually fire for this test to mean
    # anything (window margin 2 << max |offset| 7)
    plan = dcn._onehot_plan(H, W, H, W, ks, ks, 1, 1, 1, (8, 16), 2)
    y0p, x0p, cw = dcn._geometry(
        jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask),
        ks, ks, 1, 1, 1, dg)
    _, _, escaped = dcn._corner_layout(y0p, x0p, cw, plan)
    assert bool(escaped), "test setup no longer escapes the window"

    args = {"x": x, "offsets": off, "mask": mask, "weights": wts}

    def f(a):
        out = deform_conv2d(
            a["x"], a["offsets"], a["mask"], a["weights"],
            strides=1, padding=1, dilation=1, groups=1,
            deformable_groups=dg, mode="auto")
        return (out * cot).sum()

    g = jax.grad(lambda v: f({**args, wrt: v}))(jnp.asarray(args[wrt]))
    g = np.asarray(g)

    # auto must agree with gather exactly on this input (escaped branch)
    def f_gather(v):
        a = {**args, wrt: v}
        out = deform_conv2d(
            a["x"], a["offsets"], a["mask"], a["weights"],
            strides=1, padding=1, dilation=1, groups=1,
            deformable_groups=dg, mode="gather")
        return (out * cot).sum()

    g_gather = np.asarray(jax.grad(f_gather)(jnp.asarray(args[wrt])))
    # same branch, but the custom-VJP recompute schedules differently
    # than plain autodiff -> f32 rounding-level differences only
    np.testing.assert_allclose(g, g_gather, rtol=1e-4, atol=1e-6)

    flat = args[wrt].reshape(-1)
    eps = 1e-4
    idxs = rng.choice(flat.size, size=8, replace=False)
    for i in idxs:
        fplus = flat.copy()
        fplus[i] += eps
        fminus = flat.copy()
        fminus[i] -= eps
        num = (
            float(f({**args, wrt: fplus.reshape(args[wrt].shape)}))
            - float(f({**args, wrt: fminus.reshape(args[wrt].shape)}))
        ) / (2 * eps)
        np.testing.assert_allclose(
            g.reshape(-1)[i], num, rtol=2e-2, atol=2e-3,
            err_msg=f"auto/escape grad wrt {wrt} at flat index {i}")
