"""ATSS head: assignment parity vs a numpy mirror of the reference
algorithm (atss/loss.py:131-186) and loss/inference smoke."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from paa_tpu.modeling.anchors import AnchorGenerator
from paa_tpu.modeling.atss_loss import (
    ATSSLossConfig,
    atss_assign,
    atss_loss,
    compute_centerness_targets,
)

TOPK = 4


def np_iou(a, b):
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def reference_atss_assign(gt_boxes, gt_labels, anchors, level_counts, topk):
    """Numpy mirror of the torch reference for one image."""
    n = anchors.shape[0]
    num_gt = len(gt_boxes)
    ious = np_iou(anchors, gt_boxes)  # (N, G)

    acx = (anchors[:, 2] + anchors[:, 0]) / 2
    acy = (anchors[:, 3] + anchors[:, 1]) / 2
    gcx = (gt_boxes[:, 2] + gt_boxes[:, 0]) / 2
    gcy = (gt_boxes[:, 3] + gt_boxes[:, 1]) / 2
    dist = np.sqrt(
        (acx[:, None] - gcx[None]) ** 2 + (acy[:, None] - gcy[None]) ** 2
    )

    cand = []
    start = 0
    for count in level_counts:
        d = dist[start:start + count]
        k = min(topk, count)
        idx = np.argsort(d, axis=0, kind="stable")[:k]
        cand.append(idx + start)
        start += count
    cand = np.concatenate(cand, axis=0)  # (K, G)

    cand_ious = ious[cand, np.arange(num_gt)]  # (K, G)
    thresh = cand_ious.mean(0) + cand_ious.std(0, ddof=1)
    is_pos = cand_ious >= thresh[None]

    # center in gt
    ccx = acx[cand]
    ccy = acy[cand]
    l = ccx - gt_boxes[:, 0]
    t = ccy - gt_boxes[:, 1]
    r = gt_boxes[:, 2] - ccx
    b = gt_boxes[:, 3] - ccy
    in_gt = np.stack([l, t, r, b], 1).min(1) > 0.01
    is_pos = is_pos & in_gt

    ious_inf = np.full((n, num_gt), -1e8)
    for g in range(num_gt):
        sel = cand[is_pos[:, g], g]
        ious_inf[sel, g] = ious[sel, g]
    best = ious_inf.max(1)
    arg = ious_inf.argmax(1)
    labels = np.where(best > -1e7, gt_labels[arg], 0)
    return labels, arg


def build_scenario(seed=0):
    gen = AnchorGenerator(
        sizes=((32,), (64,)), aspect_ratios=(1.0,), strides=(8, 16)
    )
    shapes = [(10, 12), (5, 6)]
    anchors, counts = gen(shapes)
    gt_boxes = np.array(
        [[6, 6, 40, 44], [30, 20, 90, 75], [50, 8, 80, 38]], np.float32
    )
    gt_labels = np.array([1, 3, 2], np.int32)
    return anchors, counts, gt_boxes, gt_labels


def test_atss_assignment_matches_reference():
    anchors, counts, gt_boxes, gt_labels = build_scenario()
    ref_labels, ref_arg = reference_atss_assign(
        gt_boxes.astype(np.float64), gt_labels, anchors.astype(np.float64),
        counts, TOPK,
    )

    G = 5
    gtb = np.zeros((1, G, 4), np.float32)
    gtb[0, :3] = gt_boxes
    gtl = np.zeros((1, G), np.int32)
    gtl[0, :3] = gt_labels

    labels, assigned = atss_assign(
        jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(anchors), counts,
        TOPK,
    )
    labels = np.asarray(labels[0])
    np.testing.assert_array_equal(labels, ref_labels)
    pos = ref_labels > 0
    np.testing.assert_array_equal(np.asarray(assigned[0])[pos], ref_arg[pos])


def test_centerness_formula():
    anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    # gt centered on the anchor center -> centerness 1
    from paa_tpu.modeling.box_coder import encode_box

    gt = jnp.asarray([[2.0, 2.0, 8.0, 8.0]])
    rt = encode_box(gt, anchors)
    c = compute_centerness_targets(rt, anchors)
    np.testing.assert_allclose(np.asarray(c), 1.0, atol=1e-5)


def test_atss_loss_finite_and_differentiable():
    anchors, counts, gt_boxes, gt_labels = build_scenario()
    n = anchors.shape[0]
    rng = np.random.RandomState(0)
    gtb = np.zeros((2, 4, 4), np.float32)
    gtb[:, :3] = gt_boxes
    gtl = np.zeros((2, 4), np.int32)
    gtl[:, :3] = gt_labels
    lc = ATSSLossConfig(topk=TOPK)

    def total(p):
        out = atss_loss(
            {
                "cls_logits": jnp.tile(p["l"][None], (2, 1, 1)),
                "box_regression": jnp.tile(p["r"][None], (2, 1, 1)),
                "iou_pred": jnp.tile(p["c"][None], (2, 1)),
            },
            jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(anchors),
            counts, lc,
        )
        return out["loss_cls"] + out["loss_reg"] + out["loss_centerness"]

    p = {
        "l": jnp.asarray(rng.normal(-3, 1, (n, 5)).astype(np.float32)),
        "r": jnp.asarray(rng.normal(0, 0.3, (n, 4)).astype(np.float32)),
        "c": jnp.asarray(rng.normal(0, 1, (n,)).astype(np.float32)),
    }
    val, grads = jax.value_and_grad(total)(p)
    assert np.isfinite(float(val))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


def test_pure_retinanet_ablation_no_branch():
    """USE_CENTERNESS_PRED=False + USE_IOU_PRED=False
    (atss/ret_R_50_FPN_1.5x.yaml): the head emits NO centerness output,
    the loss has no branch term (GIoU normalized by num_pos), and
    inference fuses nothing (advisor r2 finding)."""
    import jax

    from paa_tpu.modeling.atss_head import ATSSHead

    head = ATSSHead(num_classes=5, num_levels=2, num_convs=1,
                    in_channels=32, use_branch=False)
    feats = [jnp.zeros((1, 8, 8, 32)), jnp.zeros((1, 4, 4, 32))]
    v = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(v, feats)
    assert "iou_pred" not in out
    assert "centerness" not in v["params"]

    anchors, counts, gt_boxes, gt_labels = build_scenario()
    n = anchors.shape[0]
    rng = np.random.RandomState(0)
    gtb = np.zeros((2, 4, 4), np.float32)
    gtb[:, :3] = gt_boxes
    gtl = np.zeros((2, 4), np.int32)
    gtl[:, :3] = gt_labels
    lc = ATSSLossConfig(topk=TOPK)
    losses = atss_loss(
        {
            "cls_logits": jnp.asarray(
                rng.normal(-3, 1, (2, n, 5)).astype(np.float32)),
            "box_regression": jnp.asarray(
                rng.normal(0, 0.3, (2, n, 4)).astype(np.float32)),
        },
        jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(anchors),
        counts, lc,
    )
    assert "loss_centerness" not in losses
    assert np.isfinite(float(losses["loss_cls"]))
    assert np.isfinite(float(losses["loss_reg"]))


@pytest.mark.slow  # flagship-width R-50 compile
def test_atss_model_builds_and_runs():
    from paa_tpu.config import get_cfg
    from paa_tpu.modeling import build_detection_model

    cfg = get_cfg()
    cfg.MODEL.ATSS_ON = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    model = build_detection_model(cfg)
    assert model.head_type == "atss"
    variables = model.init(jax.random.PRNGKey(0), (128, 160))
    out = model.module.apply(
        variables, jnp.zeros((1, 128, 160, 3), jnp.float32)
    )
    n = sum(h * w for h, w in model.feature_shapes((128, 160)))
    assert out["cls_logits"].shape == (1, n, 80)
    assert out["iou_pred"].shape == (1, n)  # centerness branch
    pp = model.postprocess_config()
    assert pp.score_voting is False


def test_ssc_assignment():
    from paa_tpu.modeling.atss_loss import ssc_assign

    anchors, counts, gt_boxes, gt_labels = build_scenario()
    G = 4
    gtb = np.zeros((1, G, 4), np.float32)
    gtb[0, :3] = gt_boxes
    gtl = np.zeros((1, G), np.int32)
    gtl[0, :3] = gt_labels
    labels, assigned = ssc_assign(
        jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(anchors), counts
    )
    labels = np.asarray(labels[0])
    assert (labels > 0).sum() > 0
    # every positive anchor's center lies inside its assigned gt
    acx = (anchors[:, 2] + anchors[:, 0]) / 2
    acy = (anchors[:, 3] + anchors[:, 1]) / 2
    a = np.asarray(assigned[0])
    for i in np.nonzero(labels > 0)[0]:
        g = gtb[0, a[i]]
        assert g[0] < acx[i] < g[2] and g[1] < acy[i] < g[3]
        assert labels[i] == gtl[0, a[i]]


def test_ssc_loss_runs():
    anchors, counts, gt_boxes, gt_labels = build_scenario()
    n = anchors.shape[0]
    rng = np.random.RandomState(0)
    gtb = np.zeros((1, 4, 4), np.float32)
    gtb[0, :3] = gt_boxes
    gtl = np.zeros((1, 4), np.int32)
    gtl[0, :3] = gt_labels
    lc = ATSSLossConfig(topk=TOPK, positive_type="SSC")
    out = atss_loss(
        {
            "cls_logits": jnp.asarray(
                rng.normal(-3, 1, (1, n, 5)).astype(np.float32)),
            "box_regression": jnp.asarray(
                rng.normal(0, 0.3, (1, n, 4)).astype(np.float32)),
            "iou_pred": jnp.asarray(
                rng.normal(0, 1, (1, n)).astype(np.float32)),
        },
        jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(anchors),
        counts, lc,
    )
    assert np.isfinite(float(out["loss_cls"]))


def test_iou_pred_loss_branch():
    """MODEL.ATSS.USE_IOU_PRED (atss/ret_iou_*.yaml ablation): the
    centerness branch is trained as an IoU predictor (BCE vs the IoU of
    the decoded box with its matched GT) and GIoU is IoU-weighted."""
    anchors, counts, gt_boxes, gt_labels = build_scenario()
    n = anchors.shape[0]
    rng = np.random.RandomState(1)
    gtb = np.zeros((1, 4, 4), np.float32)
    gtb[0, :3] = gt_boxes
    gtl = np.zeros((1, 4), np.int32)
    gtl[0, :3] = gt_labels
    outputs = {
        "cls_logits": jnp.asarray(
            rng.normal(-3, 1, (1, n, 5)).astype(np.float32)),
        "box_regression": jnp.asarray(
            rng.normal(0, 0.3, (1, n, 4)).astype(np.float32)),
        "iou_pred": jnp.asarray(
            rng.normal(0, 1, (1, n)).astype(np.float32)),
    }
    args = (jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(anchors),
            counts)
    lc = ATSSLossConfig(topk=TOPK, use_iou_pred=True,
                        iou_loss_weight=0.5)
    out = atss_loss(outputs, *args, lc)
    for k in ("loss_cls", "loss_reg", "loss_centerness"):
        assert np.isfinite(float(out[k])), k
    assert float(out["num_pos"]) > 0

    # perfect regression -> IoU targets 1 -> a confident (+5) iou_pred
    # must cost less than an anti-confident (-5) one
    from paa_tpu.modeling.atss_loss import atss_assign
    from paa_tpu.modeling.box_coder import encode_box

    labels, assigned = atss_assign(*args, topk=TOPK)
    matched = jnp.take_along_axis(
        jnp.asarray(gtb), np.asarray(assigned)[..., None], axis=1
    )
    perfect = encode_box(matched, jnp.asarray(anchors)[None])
    outputs_p = dict(outputs, box_regression=perfect)
    hi = atss_loss(
        dict(outputs_p, iou_pred=jnp.full((1, n), 5.0)), *args, lc
    )
    lo = atss_loss(
        dict(outputs_p, iou_pred=jnp.full((1, n), -5.0)), *args, lc
    )
    assert float(hi["loss_centerness"]) < float(lo["loss_centerness"])
