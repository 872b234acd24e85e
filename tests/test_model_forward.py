"""Smoke tests: build the PAA model from config and run a forward pass on
tiny static shapes; check shapes, init conventions, and level arithmetic."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paa_tpu.config import get_cfg

# full-model compiles: minutes cold on the CPU test runner
pytestmark = pytest.mark.slow


def paa_cfg():
    cfg = get_cfg()
    cfg.MODEL.PAA_ON = True
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    cfg.MODEL.RETINANET.USE_C5 = False
    return cfg


@pytest.fixture(scope="module")
def built():
    from paa_tpu.modeling import build_detection_model

    cfg = paa_cfg()
    model = build_detection_model(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, (128, 160), batch_size=1)
    return cfg, model, variables


def test_forward_shapes(built):
    cfg, model, variables = built
    images = jnp.zeros((2, 128, 160, 3), dtype=jnp.float32)
    out = model.module.apply(variables, images)
    shapes = model.feature_shapes((128, 160))
    n_anchors = sum(h * w for h, w in shapes)
    assert out["cls_logits"].shape == (2, n_anchors, 80)
    assert out["box_regression"].shape == (2, n_anchors, 4)
    assert out["iou_pred"].shape == (2, n_anchors)


def test_anchor_count_matches_head(built):
    cfg, model, variables = built
    flat, counts = model.anchors_for((128, 160))
    shapes = model.feature_shapes((128, 160))
    assert counts == [h * w for h, w in shapes]
    assert flat.shape[0] == sum(counts)


def test_focal_prior_bias(built):
    cfg, model, variables = built
    bias = variables["params"]["head"]["cls_logits"]["bias"]
    expected = -math.log((1 - 0.01) / 0.01)
    np.testing.assert_allclose(np.asarray(bias), expected, rtol=1e-6)


def test_prior_prob_output(built):
    # With zero input and focal-bias init, cls sigmoid ~ 0.01 on average.
    cfg, model, variables = built
    images = jnp.zeros((1, 128, 160, 3), dtype=jnp.float32)
    out = model.module.apply(variables, images)
    p = jax.nn.sigmoid(out["cls_logits"])
    assert 0.001 < float(p.mean()) < 0.1


def test_scale_params_exist(built):
    cfg, model, variables = built
    head = variables["params"]["head"]
    for l in range(5):
        assert f"scale{l}" in head


def test_frozen_bn_params_present(built):
    cfg, model, variables = built
    stem = variables["params"]["backbone"]["resnet"]["stem"]
    assert set(stem["bn1"].keys()) == {
        "weight", "bias", "running_mean", "running_var"
    }


def test_level_arithmetic_800x1344(built):
    cfg, model, variables = built
    shapes = model.feature_shapes((800, 1344))
    assert shapes == [(100, 168), (50, 84), (25, 42), (13, 21), (7, 11)]


def test_space_to_depth_stem_is_exact():
    """The 2x2-space-to-depth stem (TPU.SPACE_TO_DEPTH) + transformed
    kernel must reproduce the normal 7x7/2 stem bit-for-tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from paa_tpu.modeling.resnet import Stem
    from paa_tpu.utils.torch_import import stem_kernel_to_s2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 96, 3)).astype(np.float32))

    normal = Stem(out_channels=16)
    v = normal.init(jax.random.PRNGKey(0), x)
    # randomize the conv kernel + bn params
    tree = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.normal(0, 0.5, a.shape).astype(np.float32)
        ),
        v,
    )
    tree["params"]["bn1"]["running_var"] = jnp.abs(
        tree["params"]["bn1"]["running_var"]
    ) + 0.5
    y_ref = normal.apply(tree, x)

    s2d = Stem(out_channels=16, space_to_depth=True)
    v2 = jax.tree_util.tree_map(lambda a: a, tree)
    v2["params"]["conv1"]["kernel"] = jnp.asarray(
        stem_kernel_to_s2d(np.asarray(tree["params"]["conv1"]["kernel"]))
    )
    y_s2d = s2d.apply(v2, x)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )
