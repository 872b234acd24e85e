"""Eval sharding: make_eval_fn(mesh) shard_maps the batch over the data
axis and must produce exactly the single-device results (the Pallas NMS
custom call has no SPMD rule, hence shard_map rather than pjit
annotations — utils/comm.shard_eval_fn)."""

import jax
import jax.numpy as jnp
import numpy as np

from paa_tpu.config import get_cfg
from paa_tpu.modeling import build_detection_model
from paa_tpu.utils.comm import get_data_mesh


def _eval_both(cfg, hw, batch):
    model = build_detection_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), hw)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(-2, 2, (batch, *hw, 3)).astype(np.float32)
    )
    sizes = jnp.asarray(
        np.tile(np.array([[hw[0], hw[1]]], np.float32), (batch, 1))
    )
    single = model.make_eval_fn(variables)(images, sizes)
    sharded = model.make_eval_fn(variables, mesh=get_data_mesh())(
        images, sizes
    )
    # XLA schedules convs differently at batch 8 vs the per-shard batch
    # 1, so activations carry ~1e-5 relative noise; it amplifies through
    # ROI-align + exp box decode into ~1e-2 absolute box drift. The
    # DISCRETE outputs (which candidates survive, their labels) must
    # match exactly; coordinates/scores to tolerance.
    np.testing.assert_array_equal(
        np.asarray(single["valid"]), np.asarray(sharded["valid"])
    )
    np.testing.assert_array_equal(
        np.asarray(single["labels"]), np.asarray(sharded["labels"])
    )
    np.testing.assert_allclose(
        np.asarray(single["scores"]), np.asarray(sharded["scores"]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(single["boxes"]), np.asarray(sharded["boxes"]),
        atol=0.05,
    )
    return single


def test_sharded_eval_dense():
    cfg = get_cfg()
    cfg.MODEL.PAA_ON = True
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 64
    cfg.MODEL.PAA.PRE_NMS_TOP_N = 50
    cfg.TEST.DETECTIONS_PER_IMG = 10
    cfg.freeze()
    out = _eval_both(cfg, (64, 96), 8)
    assert out["boxes"].shape == (8, 10, 4)


def test_sharded_eval_two_stage():
    cfg = get_cfg()
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 64
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 50
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 20
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 40
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 5
    cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM = 64
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 10
    cfg.freeze()
    out = _eval_both(cfg, (64, 96), 8)
    assert out["boxes"].shape == (8, 10, 4)
