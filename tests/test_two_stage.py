"""Faster R-CNN two-stage path: proposal selection, ROI sampling, losses,
eval postprocessing — on tiny shapes with reduced capacities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paa_tpu.config import get_cfg
from paa_tpu.modeling.rpn import (
    RPNConfig,
    balanced_sample,
    rpn_loss,
    select_proposals,
)
from paa_tpu.modeling.roi_box_head import (
    ROIBoxConfig,
    roi_box_loss,
    roi_box_postprocess,
    subsample_proposals,
)


def test_balanced_sampler_caps():
    rng = jax.random.PRNGKey(0)
    labels = jnp.asarray([1] * 10 + [0] * 50 + [-1] * 5)
    pos, neg = balanced_sample(labels, rng, 32, 0.5)
    pos, neg = np.asarray(pos), np.asarray(neg)
    assert pos.sum() == 10  # fewer positives than the 16 cap
    assert neg.sum() == 22  # fills to 32
    assert not (pos & (np.asarray(labels) != 1)).any()
    assert not (neg & (np.asarray(labels) != 0)).any()


def test_balanced_sampler_many_positives():
    rng = jax.random.PRNGKey(1)
    labels = jnp.asarray([1] * 100 + [0] * 100)
    pos, neg = balanced_sample(labels, rng, 64, 0.25)
    assert int(pos.sum()) == 16
    assert int(neg.sum()) == 48


def small_rpn_setup():
    from paa_tpu.modeling.anchors import AnchorGenerator

    gen = AnchorGenerator(
        sizes=(16, 32), aspect_ratios=(0.5, 1.0, 2.0), strides=(4, 8)
    )
    shapes = [(8, 8), (4, 4)]
    anchors, counts = gen(shapes)
    return anchors, counts


def test_select_proposals_shapes_and_validity():
    anchors, counts = small_rpn_setup()
    n = anchors.shape[0]
    rng = np.random.RandomState(0)
    outputs = {
        "objectness": jnp.asarray(rng.normal(0, 1, (2, n)).astype(np.float32)),
        "box_regression": jnp.asarray(
            rng.normal(0, 0.2, (2, n, 4)).astype(np.float32)
        ),
    }
    rc = RPNConfig(pre_nms_top_n=50, post_nms_top_n=20,
                   fpn_post_nms_top_n=30, nms_thresh=0.7)
    props, scores, valid = select_proposals(
        outputs, jnp.full((2, 2), 32.0), jnp.asarray(anchors), counts, rc
    )
    assert props.shape == (2, 30, 4)
    v = np.asarray(valid)
    s = np.asarray(scores)
    # scores sorted descending among valid
    for b in range(2):
        sv = s[b][v[b]]
        assert (np.diff(sv) <= 1e-6).all()
    # proposals clipped to the image
    p = np.asarray(props)[np.asarray(valid)]
    assert (p >= 0).all() and (p <= 31).all()


def test_rpn_loss_finite():
    anchors, counts = small_rpn_setup()
    n = anchors.shape[0]
    rng = np.random.RandomState(0)
    gtb = jnp.asarray([[[4, 4, 20, 24], [10, 8, 30, 28]]], jnp.float32)
    gtl = jnp.asarray([[1, 1]], jnp.int32)
    rc = RPNConfig(batch_size_per_image=32)

    def total(p):
        out = rpn_loss(
            {"objectness": p["o"][None], "box_regression": p["r"][None]},
            gtb, gtl, jnp.asarray(anchors), counts, rc,
            jax.random.PRNGKey(0),
        )
        return out["loss_objectness"] + out["loss_rpn_box_reg"]

    p = {
        "o": jnp.asarray(rng.normal(0, 1, (n,)).astype(np.float32)),
        "r": jnp.asarray(rng.normal(0, 0.2, (n, 4)).astype(np.float32)),
    }
    val, grads = jax.value_and_grad(total)(p)
    assert np.isfinite(float(val))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


def test_subsample_includes_gt_and_labels():
    bc = ROIBoxConfig(batch_size_per_image=16, num_classes=5)
    rng = jax.random.PRNGKey(0)
    proposals = jnp.asarray(
        [[0, 0, 10, 10], [50, 50, 60, 60], [5, 5, 14, 14]], jnp.float32
    )
    p_valid = jnp.asarray([True, True, True])
    gt_boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 0, 0]], jnp.float32)
    gt_labels = jnp.asarray([3, 0], jnp.int32)
    rois, labels, reg_t, valid, gt_idx, gt_b = subsample_proposals(
        proposals, p_valid, gt_boxes, gt_labels, bc, rng
    )
    assert rois.shape == (16, 4)
    labels = np.asarray(labels)
    valid = np.asarray(valid)
    # the exact-overlap proposal and the appended gt itself are positive
    assert (labels[valid] == 3).sum() >= 2
    # far-away proposal is background
    assert (labels[valid] == 0).sum() >= 1


def test_roi_box_loss_and_postprocess():
    rng = np.random.RandomState(0)
    R, C = 8, 5
    cls_logits = jnp.asarray(rng.normal(0, 1, (R, C)).astype(np.float32))
    box_deltas = jnp.asarray(
        rng.normal(0, 0.1, (R, C, 4)).astype(np.float32)
    )
    roi_labels = jnp.asarray([3, 0, 0, 2, -1, 0, 1, 0], jnp.int32)
    reg_targets = jnp.asarray(
        rng.normal(0, 0.1, (R, 4)).astype(np.float32)
    )
    roi_valid = jnp.ones(R, bool)
    losses = roi_box_loss(
        cls_logits, box_deltas, roi_labels, reg_targets, roi_valid
    )
    assert np.isfinite(float(losses["loss_classifier"]))
    assert np.isfinite(float(losses["loss_box_reg"]))

    rois = jnp.asarray(
        rng.uniform(0, 40, (R, 4)).astype(np.float32)
    )
    rois = rois.at[:, 2:].set(rois[:, :2] + 10)
    bc = ROIBoxConfig(num_classes=C, detections_per_img=6)
    det = roi_box_postprocess(
        cls_logits, box_deltas, rois, roi_valid,
        jnp.asarray([64.0, 64.0]), bc,
    )
    assert det["boxes"].shape == (6, 4)
    assert int(det["labels"].max()) <= C - 1


@pytest.mark.slow
def test_faster_rcnn_end_to_end_tiny():
    from paa_tpu.modeling.two_stage import (
        build_faster_rcnn,
        faster_rcnn_eval_fn,
        faster_rcnn_train_step_fns,
    )

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 5
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 50
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 20
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 40
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 50
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 20
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 40
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32

    model = build_faster_rcnn(cfg)
    hw = (64, 64)
    variables = model.init(jax.random.PRNGKey(0), hw)

    loss_fn = faster_rcnn_train_step_fns(model, hw)
    images = jnp.zeros((1, *hw, 3), jnp.float32)
    gtb = jnp.asarray([[[4, 4, 30, 30], [0, 0, 0, 0]]], jnp.float32)
    gtl = jnp.asarray([[2, 0]], jnp.int32)
    sizes = jnp.asarray([[64.0, 64.0]])
    losses = jax.jit(loss_fn)(
        variables, images, gtb, gtl, sizes, jax.random.PRNGKey(1)
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert {"loss_objectness", "loss_rpn_box_reg", "loss_classifier",
            "loss_box_reg"} <= set(losses)

    eval_fn = faster_rcnn_eval_fn(model, hw)
    det = jax.jit(eval_fn)(variables, images, sizes)
    assert det["boxes"].shape[0] == 1
    assert det["boxes"].shape[2] == 4


def test_roi_box_postprocess_batched_matches_vmap():
    """roi_box_postprocess_batched == vmap(roi_box_postprocess): same
    kept sets/labels/scores (the eval fn now uses the batched form with
    one lock-step NMS dispatch)."""
    from paa_tpu.modeling.roi_box_head import (
        roi_box_postprocess_batched,
    )

    rng = np.random.RandomState(3)
    b, r, c = 3, 40, 6
    cls_logits = jnp.asarray(
        rng.normal(0, 2, (b, r, c)).astype(np.float32)
    )
    box_deltas = jnp.asarray(
        rng.normal(0, 0.3, (b, r, c, 4)).astype(np.float32)
    )
    rois = rng.uniform(0, 80, (b, r, 4)).astype(np.float32)
    rois[..., 2:] += rois[..., :2] + 8
    rois = jnp.asarray(rois)
    roi_valid = jnp.asarray(rng.rand(b, r) > 0.2)
    sizes = jnp.asarray(
        np.tile(np.array([[120.0, 160.0]], np.float32), (b, 1))
    )
    bc = ROIBoxConfig(detections_per_img=12)

    ref = jax.vmap(
        lambda cl, bd, ro, v, sz: roi_box_postprocess(
            cl, bd, ro, v, sz, bc
        )
    )(cls_logits, box_deltas, rois, roi_valid, sizes)
    got = roi_box_postprocess_batched(
        cls_logits, box_deltas, rois, roi_valid, sizes, bc
    )
    np.testing.assert_array_equal(
        np.asarray(ref["valid"]), np.asarray(got["valid"])
    )
    np.testing.assert_array_equal(
        np.asarray(ref["labels"]), np.asarray(got["labels"])
    )
    np.testing.assert_allclose(
        np.asarray(ref["scores"]), np.asarray(got["scores"]),
        rtol=1e-6,
    )
    kv = np.asarray(ref["valid"])
    np.testing.assert_allclose(
        np.asarray(ref["boxes"])[kv], np.asarray(got["boxes"])[kv],
        rtol=1e-5, atol=1e-5,
    )


def test_nms_batched_vmem_chunking(monkeypatch):
    """With a tiny VMEM budget the pallas dispatch splits the batch into
    image chunks; results are identical to the unchunked path."""
    import importlib

    # paa_tpu.ops re-exports the nms FUNCTION under the same name, so
    # fetch the submodule explicitly
    nms_mod = importlib.import_module("paa_tpu.ops.nms")

    rng = np.random.RandomState(5)
    b, n = 5, 300
    boxes = rng.uniform(0, 200, (b, n, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 60, (b, n, 2))
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, (b, n)).astype(np.int32))
    valid = jnp.asarray(rng.rand(b, n) > 0.3)

    ref = jax.vmap(
        lambda bx, s, l, v: nms_mod.nms(bx, s, l, v, 0.5, 16)
    )(boxes, scores, labels, valid)

    monkeypatch.setattr(nms_mod, "_FORCED_IMPL", "pallas")
    monkeypatch.setattr(nms_mod, "_VMEM_NMS_BUDGET", 300 * 28 * 2)
    got = nms_mod.nms_batched_auto(
        boxes, scores, labels, valid, 0.5, 16
    )
    np.testing.assert_array_equal(
        np.asarray(ref[2]), np.asarray(got[2])
    )
    kv = np.asarray(ref[2])
    np.testing.assert_array_equal(
        np.asarray(ref[0])[kv], np.asarray(got[0])[kv]
    )
