"""Deformable PSRoI pooling vs a numpy transcription of the reference
CUDA kernel (paa_core/csrc/cuda/deform_pool_kernel_cuda.cu
DeformablePSROIPoolForwardKernel)."""

import numpy as np
import jax.numpy as jnp

from paa_tpu.ops.deform_pool import deform_psroi_pool


def np_deform_psroi(feat_nchw, rois5, trans_nchw, spatial_scale, out_size,
                    out_channels, group_size, part_size, sample_per_part,
                    trans_std, no_trans):
    """Direct loop transcription of the CUDA kernel (test oracle)."""
    n_rois = rois5.shape[0]
    _, channels, height, width = feat_nchw.shape
    num_classes = 1 if no_trans else trans_nchw.shape[1] // 2
    ceach = out_channels // num_classes
    out = np.zeros((n_rois, out_channels, out_size, out_size))

    def bil(data, x, y):
        x1, x2 = int(np.floor(x)), int(np.ceil(x))
        y1, y2 = int(np.floor(y)), int(np.ceil(y))
        dx, dy = x - x1, y - y1
        return ((1 - dx) * (1 - dy) * data[y1, x1]
                + (1 - dx) * dy * data[y2, x1]
                + dx * (1 - dy) * data[y1, x2]
                + dx * dy * data[y2, x2])

    for n in range(n_rois):
        bi = int(rois5[n, 0])
        x0 = round(rois5[n, 1]) * spatial_scale - 0.5
        y0 = round(rois5[n, 2]) * spatial_scale - 0.5
        x1 = (round(rois5[n, 3]) + 1.0) * spatial_scale - 0.5
        y1 = (round(rois5[n, 4]) + 1.0) * spatial_scale - 0.5
        rw = max(x1 - x0, 0.1)
        rh = max(y1 - y0, 0.1)
        bw, bh = rw / out_size, rh / out_size
        sw, sh = bw / sample_per_part, bh / sample_per_part
        for ctop in range(out_channels):
            cls = ctop // ceach
            for ph in range(out_size):
                for pw in range(out_size):
                    part_h = int(np.floor(ph / out_size * part_size))
                    part_w = int(np.floor(pw / out_size * part_size))
                    tx = 0.0 if no_trans else trans_nchw[
                        n, cls * 2, part_h, part_w] * trans_std
                    ty = 0.0 if no_trans else trans_nchw[
                        n, cls * 2 + 1, part_h, part_w] * trans_std
                    ws = pw * bw + x0 + tx * rw
                    hs = ph * bh + y0 + ty * rh
                    gw = min(max(pw * group_size // out_size, 0),
                             group_size - 1)
                    gh = min(max(ph * group_size // out_size, 0),
                             group_size - 1)
                    c = (ctop * group_size + gh) * group_size + gw
                    total, cnt = 0.0, 0
                    for ih in range(sample_per_part):
                        for iw in range(sample_per_part):
                            w = ws + iw * sw
                            h = hs + ih * sh
                            if (w < -0.5 or w > width - 0.5
                                    or h < -0.5 or h > height - 0.5):
                                continue
                            w = min(max(w, 0.0), width - 1.0)
                            h = min(max(h, 0.0), height - 1.0)
                            total += bil(feat_nchw[bi, c], w, h)
                            cnt += 1
                    out[n, ctop, ph, pw] = 0.0 if cnt == 0 else total / cnt
    return out


def _run_case(no_trans, num_classes=1, seed=0):
    rng = np.random.RandomState(seed)
    B, D, G, P, S = 2, 4, 2, 3, 2
    C = D * G * G
    H, W = 12, 16
    feat = rng.normal(0, 1, (B, C, H, W)).astype(np.float32)
    rois5 = np.array(
        [
            [0, 8, 4, 40, 28],
            [1, 0, 0, 63, 47],
            [0, 30, 20, 34, 24],  # tiny roi
        ],
        np.float32,
    )
    part = P
    trans = rng.normal(0, 1, (len(rois5), 2 * num_classes, part, part)
                       ).astype(np.float32)

    want = np_deform_psroi(
        feat, rois5, trans, spatial_scale=0.25, out_size=P,
        out_channels=D, group_size=G, part_size=part,
        sample_per_part=S, trans_std=0.1, no_trans=no_trans,
    )

    feats_nhwc = jnp.asarray(np.transpose(feat, (0, 2, 3, 1)))
    got = deform_psroi_pool(
        feats_nhwc,
        jnp.asarray(rois5[:, 1:]),
        jnp.asarray(rois5[:, 0].astype(np.int32)),
        None if no_trans
        else jnp.asarray(np.transpose(trans, (0, 2, 3, 1))),
        spatial_scale=0.25, out_size=P, out_channels=D, group_size=G,
        part_size=part, sample_per_part=S, trans_std=0.1,
    )
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-4, atol=1e-5)


def test_deform_psroi_no_trans():
    _run_case(no_trans=True)


def test_deform_psroi_with_offsets():
    _run_case(no_trans=False)


def test_deform_psroi_multiclass_offsets():
    _run_case(no_trans=False, num_classes=2, seed=3)
