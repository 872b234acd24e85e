"""FCOS: assignment parity vs a numpy reference mirror; IOULoss formula;
model build/forward smoke."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from paa_tpu.modeling.anchors import LocationGenerator
from paa_tpu.modeling.fcos_loss import (
    FCOSLossConfig,
    OBJECT_SIZES,
    fcos_assign,
    fcos_loss,
    iou_loss_ltrb,
)


def reference_fcos_assign(gt_boxes, gt_labels, locations, level_counts):
    """Numpy mirror of compute_targets_for_locations (no center sampling)."""
    xs, ys = locations[:, 0], locations[:, 1]
    n = len(locations)
    g = len(gt_boxes)
    l = xs[:, None] - gt_boxes[None, :, 0]
    t = ys[:, None] - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - xs[:, None]
    b = gt_boxes[None, :, 3] - ys[:, None]
    reg = np.stack([l, t, r, b], axis=2)
    in_boxes = reg.min(2) > 0
    max_reg = reg.max(2)
    lo = np.concatenate([
        np.full(c, OBJECT_SIZES[i][0]) for i, c in enumerate(level_counts)
    ])
    hi = np.concatenate([
        np.full(c, OBJECT_SIZES[i][1]) for i, c in enumerate(level_counts)
    ])
    cared = (max_reg >= lo[:, None]) & (max_reg <= hi[:, None])
    area = (gt_boxes[:, 2] - gt_boxes[:, 0] + 1) * (
        gt_boxes[:, 3] - gt_boxes[:, 1] + 1
    )
    loc_area = np.tile(area[None], (n, 1)).astype(np.float64)
    loc_area[~in_boxes] = 1e8
    loc_area[~cared] = 1e8
    idx = loc_area.argmin(1)
    mn = loc_area.min(1)
    labels = gt_labels[idx].copy()
    labels[mn == 1e8] = 0
    reg_t = reg[np.arange(n), idx]
    return labels, reg_t


def scenario():
    gen = LocationGenerator((8, 16))
    shapes = [(10, 12), (5, 6)]
    loc4, counts = gen(shapes)
    gt_boxes = np.array(
        [[6, 6, 40, 44], [10, 10, 80, 70], [50, 8, 80, 38]], np.float32
    )
    gt_labels = np.array([1, 3, 2], np.int32)
    return loc4, counts, gt_boxes, gt_labels


def test_fcos_assignment_matches_reference():
    loc4, counts, gt_boxes, gt_labels = scenario()
    ref_labels, ref_reg = reference_fcos_assign(
        gt_boxes.astype(np.float64), gt_labels, loc4[:, :2], counts
    )

    G = 5
    gtb = np.zeros((1, G, 4), np.float32)
    gtb[0, :3] = gt_boxes
    gtl = np.zeros((1, G), np.int32)
    gtl[0, :3] = gt_labels

    labels, reg = fcos_assign(
        jnp.asarray(gtb), jnp.asarray(gtl),
        jnp.asarray(loc4[:, :2]), counts, FCOSLossConfig(),
    )
    np.testing.assert_array_equal(np.asarray(labels[0]), ref_labels)
    pos = ref_labels > 0
    np.testing.assert_allclose(
        np.asarray(reg[0])[pos], ref_reg[pos], rtol=1e-5
    )


def test_iou_loss_perfect_prediction_is_zero():
    t = jnp.asarray([[3.0, 4.0, 5.0, 6.0]])
    assert abs(float(iou_loss_ltrb(t, t, "iou")[0])) < 1e-5
    assert abs(float(iou_loss_ltrb(t, t, "linear_iou")[0])) < 1e-6
    assert abs(float(iou_loss_ltrb(t, t, "giou")[0])) < 1e-6


def test_fcos_loss_finite():
    loc4, counts, gt_boxes, gt_labels = scenario()
    n = loc4.shape[0]
    rng = np.random.RandomState(0)
    gtb = np.zeros((2, 4, 4), np.float32)
    gtb[:, :3] = gt_boxes
    gtl = np.zeros((2, 4), np.int32)
    gtl[:, :3] = gt_labels

    def total(p):
        out = fcos_loss(
            {
                "cls_logits": jnp.tile(p["l"][None], (2, 1, 1)),
                "box_regression": jnp.tile(p["r"][None], (2, 1, 1)),
                "iou_pred": jnp.tile(p["c"][None], (2, 1)),
            },
            jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(loc4),
            counts, FCOSLossConfig(),
        )
        return out["loss_cls"] + out["loss_reg"] + out["loss_centerness"]

    p = {
        "l": jnp.asarray(rng.normal(-3, 1, (n, 5)).astype(np.float32)),
        # exp head output: strictly positive
        "r": jnp.asarray(np.exp(rng.normal(1, 0.3, (n, 4))).astype(np.float32)),
        "c": jnp.asarray(rng.normal(0, 1, (n,)).astype(np.float32)),
    }
    val, grads = jax.value_and_grad(total)(p)
    assert np.isfinite(float(val))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow  # flagship-width R-50 compile
def test_fcos_model_builds_and_runs():
    from paa_tpu.config import get_cfg
    from paa_tpu.modeling import build_detection_model

    cfg = get_cfg()
    cfg.MODEL.FCOS_ON = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    model = build_detection_model(cfg)
    assert model.head_type == "fcos"
    variables = model.init(jax.random.PRNGKey(0), (128, 160))
    out = model.module.apply(
        variables, jnp.zeros((1, 128, 160, 3), jnp.float32)
    )
    n = sum(h * w for h, w in model.feature_shapes((128, 160)))
    assert out["cls_logits"].shape == (1, n, 80)
    # exp() head: regression strictly positive
    assert float(out["box_regression"].min()) > 0
    anchors, counts = model.anchors_for((128, 160))
    det = model.postprocess(
        out, jnp.asarray([[128.0, 160.0]]), jnp.asarray(anchors), counts
    )
    assert det["boxes"].shape[1] == 100
