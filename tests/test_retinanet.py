"""RetinaNet head: smooth-L1 formula, loss normalization semantics,
anchor shapes (9/loc), model build/forward smoke."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from paa_tpu.config import get_cfg
from paa_tpu.modeling.anchors import make_anchor_generator_retinanet
from paa_tpu.modeling.retinanet_head import (
    RetinaNetLossConfig,
    retinanet_loss,
    smooth_l1,
)


def test_smooth_l1_formula():
    # reference layers/smooth_l1_loss.py: beta branch at |x| < beta
    beta = 0.11
    x = jnp.asarray([0.0, 0.05, 0.11, 1.0])
    y = jnp.zeros(4)
    out = np.asarray(smooth_l1(x, y, beta))
    np.testing.assert_allclose(out[0], 0.0, atol=1e-8)
    np.testing.assert_allclose(out[1], 0.5 * 0.05 ** 2 / beta, rtol=1e-5)
    np.testing.assert_allclose(out[2], 0.11 - 0.5 * beta, rtol=1e-5)
    np.testing.assert_allclose(out[3], 1.0 - 0.5 * beta, rtol=1e-5)


def test_retinanet_anchor_count():
    cfg = get_cfg()
    gen = make_anchor_generator_retinanet(cfg)
    assert gen.num_anchors_per_location == 9  # 3 ratios x 3 scales
    flat, counts = gen([(4, 5), (2, 3)])
    assert counts == [4 * 5 * 9, 2 * 3 * 9]


def test_loss_finite_and_normalized():
    cfg = get_cfg()
    gen = make_anchor_generator_retinanet(cfg)
    # small two-level grid with stride 8/16 anchors
    from paa_tpu.modeling.anchors import AnchorGenerator, expand_octave_sizes

    sizes = expand_octave_sizes((32, 64), 2.0, 3)
    gen = AnchorGenerator(sizes, (0.5, 1.0, 2.0), (8, 16))
    anchors, counts = gen([(8, 8), (4, 4)])
    n = anchors.shape[0]
    rng = np.random.RandomState(0)
    gtb = np.zeros((2, 3, 4), np.float32)
    gtb[:, 0] = [8, 8, 40, 40]
    gtb[:, 1] = [20, 12, 60, 60]
    gtl = np.zeros((2, 3), np.int32)
    gtl[:, 0] = 1
    gtl[:, 1] = 4

    lc = RetinaNetLossConfig()

    def total(p):
        out = retinanet_loss(
            {
                "cls_logits": jnp.tile(p["l"][None], (2, 1, 1)),
                "box_regression": jnp.tile(p["r"][None], (2, 1, 1)),
            },
            jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(anchors),
            counts, lc,
        )
        return out["loss_retina_cls"] + out["loss_retina_reg"]

    p = {
        "l": jnp.asarray(rng.normal(-4, 1, (n, 5)).astype(np.float32)),
        "r": jnp.asarray(rng.normal(0, 0.2, (n, 4)).astype(np.float32)),
    }
    val, grads = jax.value_and_grad(total)(p)
    assert np.isfinite(float(val))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()

    out = retinanet_loss(
        {
            "cls_logits": jnp.tile(p["l"][None], (2, 1, 1)),
            "box_regression": jnp.tile(p["r"][None], (2, 1, 1)),
        },
        jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(anchors), counts,
        lc,
    )
    assert int(out["num_pos"]) > 0


@pytest.mark.slow  # flagship-width R-50 compile
def test_retinanet_model_builds_and_runs():
    from paa_tpu.modeling import build_detection_model

    cfg = get_cfg()
    cfg.MODEL.RETINANET_ON = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = True  # retinanet default
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    model = build_detection_model(cfg)
    assert model.head_type == "retinanet"
    variables = model.init(jax.random.PRNGKey(0), (128, 160))
    out = model.module.apply(
        variables, jnp.zeros((1, 128, 160, 3), jnp.float32)
    )
    n = sum(h * w for h, w in model.feature_shapes((128, 160))) * 9
    assert out["cls_logits"].shape == (1, n, 80)
    assert "iou_pred" not in out
    # towers have no GroupNorm
    assert "gn0" not in variables["params"]["head"]["cls_tower"]
    pp = model.postprocess_config()
    assert pp.nms_thresh == 0.4
