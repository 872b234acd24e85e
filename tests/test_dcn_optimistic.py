"""DCN 'optimistic' mode: cond-free onehot program + per-image escape
flags + host-side gather redispatch (ops/dcn.py, engine/inference.py).

The mode exists to cut 'auto's cold compile (auto compiles BOTH
lax.cond branches for every DCN layer) while keeping end-to-end
exactness for arbitrary offsets — matching the reference CUDA kernels
(csrc/cuda/deform_conv_kernel_cuda.cu), whose sampling has no window
restriction — via re-running escaped batches through a gather-pinned
model.
"""

import numpy as np
import jax
import jax.numpy as jnp

from paa_tpu.config import get_cfg
from paa_tpu.modeling import build_detection_model
from paa_tpu.ops.dcn import (
    dcn_escape_flags,
    deform_conv2d,
    set_default_dcn_mode,
)


def test_escape_flags_per_image():
    # escapes must land INSIDE the image (the CUDA center gate zeroes
    # fully-out-of-image samples, which therefore do NOT escape) but
    # OUTSIDE the 8x16 tile's window: dy=+10 at output (5, 7) samples
    # y=14 in a 16-row map whose tile-0 window ends at y=13 (margin 2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(3, 16, 20, 8)).astype(np.float32))
    offsets = np.zeros((3, 16, 20, 18), np.float32)
    offsets[0] = rng.uniform(-1.5, 1.5, offsets[0].shape)  # in-margin
    offsets[1, 5, 7, 4] = 10.0
    flags = np.asarray(
        dcn_escape_flags(x, jnp.asarray(offsets), None, window_margin=2)
    )
    assert flags.tolist() == [False, True, False]


def test_gated_out_of_image_sample_is_not_an_escape():
    x = jnp.zeros((1, 16, 20, 8), jnp.float32)
    offsets = np.zeros((1, 16, 20, 18), np.float32)
    offsets[0, 5, 7, 4] = 40.0  # y=44 >> H: center-gated to weight 0
    flags = np.asarray(
        dcn_escape_flags(x, jnp.asarray(offsets), None, window_margin=2)
    )
    assert not flags[0]


def test_escape_flag_respects_modulation_mask():
    # an escaping sample whose v2 modulation weight is exactly zero
    # contributes nothing — it must NOT trip the flag
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 20, 8)).astype(np.float32))
    offsets = np.zeros((1, 16, 20, 18), np.float32)
    offsets[0, 5, 7, 4] = 10.0
    mask = np.ones((1, 16, 20, 9), np.float32)
    assert bool(
        np.asarray(dcn_escape_flags(x, jnp.asarray(offsets),
                                    jnp.asarray(mask), window_margin=2))[0]
    )
    mask[0, 5, 7, 2] = 0.0  # offset pair 4 = (dy,dx) of kernel tap 2
    assert not bool(
        np.asarray(dcn_escape_flags(x, jnp.asarray(offsets),
                                    jnp.asarray(mask), window_margin=2))[0]
    )


def test_optimistic_functional_equals_onehot():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.normal(size=(2, 12, 14, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 4)).astype(np.float32))
    offsets = jnp.asarray(
        rng.uniform(-1.2, 1.2, (2, 12, 14, 18)).astype(np.float32)
    )
    a = deform_conv2d(x, offsets, None, w, mode="optimistic")
    b = deform_conv2d(x, offsets, None, w, mode="onehot")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _dcn_cfg(mode):
    cfg = get_cfg()
    cfg.MODEL.PAA_ON = True
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.STAGE_WITH_DCN = (False, True, True, True)
    cfg.MODEL.RESNETS.WITH_MODULATED_DCN = True
    cfg.MODEL.PAA.PRE_NMS_TOP_N = 50
    cfg.TEST.DETECTIONS_PER_IMG = 10
    cfg.TEST.IMS_PER_BATCH = 2  # keep eval off the 8-device CPU mesh
    cfg.TPU.DCN_MODE = mode
    cfg.freeze()
    return cfg


def _big_offset_params(params):
    """Push one backbone DCN offset-conv bias out of its onehot window
    but not out of the image (fully-out-of-image samples are gated to
    zero weight and do not escape): dy=dx=+10 on a 16-row stride-8 map
    samples y=14..15 past tile 0's window end (y=13 at margin 2)."""
    params = jax.tree_util.tree_map(np.asarray, params)
    target = params["backbone"]["resnet"]["layer2_0"]["conv2"]["offset"]
    bias = target["bias"].copy()
    bias[:18] = 10.0
    target["bias"] = bias
    return jax.tree_util.tree_map(jnp.asarray, params)


def test_eval_fn_reports_and_engine_redispatches():
    hw = (128, 96)
    cfg_opt = _dcn_cfg("optimistic")
    model = build_detection_model(cfg_opt)
    variables = model.init(jax.random.PRNGKey(0), hw)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(-2, 2, (2, *hw, 3)).astype(np.float32))
    sizes = jnp.asarray(
        np.tile(np.array([[float(hw[0]), float(hw[1])]], np.float32), (2, 1))
    )

    # zero-init offset conv -> no escapes; output must equal gather mode
    det = model.make_eval_fn(variables)(images, sizes)
    assert not np.asarray(det["dcn_escaped"]).any()
    cfg_g = _dcn_cfg("gather")
    gather_model = build_detection_model(cfg_g)
    det_g = gather_model.make_eval_fn(variables)(images, sizes)
    np.testing.assert_array_equal(
        np.asarray(det["valid"]), np.asarray(det_g["valid"])
    )
    np.testing.assert_allclose(
        np.asarray(det["scores"]), np.asarray(det_g["scores"]), atol=1e-4
    )

    # huge offsets -> flags fire; the engine's fallback re-run must
    # reproduce the gather model exactly
    big = {"params": _big_offset_params(variables["params"])}
    model2 = build_detection_model(cfg_opt)  # reset process default
    det2 = model2.make_eval_fn(big)(images, sizes)
    assert np.asarray(det2["dcn_escaped"]).any()

    from paa_tpu.engine.inference import compute_on_dataset

    batch = {
        "images": np.asarray(images),
        "image_sizes": np.asarray(sizes),
        "image_ids": np.array([1, 2]),
        "orig_sizes": np.asarray(sizes),
    }
    preds, _, n = compute_on_dataset(model2, big, [batch])
    gather_model2 = build_detection_model(cfg_g)
    preds_g, _, n_g = compute_on_dataset(gather_model2, big, [batch])
    assert n == n_g == 2
    assert sorted(preds) == sorted(preds_g)
    for img_id in preds:
        np.testing.assert_allclose(
            preds[img_id]["boxes_xywh"], preds_g[img_id]["boxes_xywh"],
            atol=1e-3,
        )
        np.testing.assert_allclose(
            preds[img_id]["scores"], preds_g[img_id]["scores"], atol=1e-5
        )
        np.testing.assert_array_equal(
            preds[img_id]["labels"], preds_g[img_id]["labels"]
        )
    set_default_dcn_mode("auto")  # restore the process default
