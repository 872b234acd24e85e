"""Mask structures + mask head tests."""

import numpy as np
import jax
import jax.numpy as jnp

from paa_tpu.structures.masks import (
    box_normalized_mask,
    paste_mask_in_image,
    polygons_to_bitmask,
    rasterize_instances,
)
from paa_tpu.modeling.roi_mask_head import (
    MaskHead,
    crop_gt_masks_for_rois,
    mask_loss,
)


def test_polygon_rasterization():
    # a 10x10 square at (5, 5)
    poly = [5, 5, 15, 5, 15, 15, 5, 15]
    mask = polygons_to_bitmask([poly], 20, 20)
    assert mask[10, 10] == 1
    assert mask[2, 2] == 0
    assert 80 <= mask.sum() <= 130  # ~11x11 under fillPoly conventions


def test_box_normalized_mask_full_box():
    # polygon == the box -> the normalized mask is (nearly) all ones
    poly = [4, 4, 24, 4, 24, 24, 4, 24]
    m = box_normalized_mask([poly], (4, 4, 24, 24), mask_size=32)
    assert m.mean() > 0.85


def test_crop_gt_masks_identity():
    # roi == gt box -> target equals the (resized) gt mask
    gt = np.zeros((1, 32, 32), np.float32)
    gt[0, :16, :] = 1.0  # top half
    rois = jnp.asarray([[10.0, 10.0, 40.0, 40.0]])
    t = crop_gt_masks_for_rois(
        jnp.asarray(gt), rois, rois, out_size=16
    )
    t = np.asarray(t)[0]
    assert t[:7].mean() > 0.9  # top rows on
    assert t[9:].mean() < 0.1  # bottom rows off


def test_crop_gt_masks_shifted_roi():
    # roi covering only the right half of the gt box: a vertical split
    # mask becomes all-on/all-off accordingly
    gt = np.zeros((1, 32, 32), np.float32)
    gt[0, :, 16:] = 1.0  # right half of the gt box frame
    gt_box = jnp.asarray([[0.0, 0.0, 31.0, 31.0]])
    roi = jnp.asarray([[16.0, 0.0, 31.0, 31.0]])  # right half
    t = np.asarray(
        crop_gt_masks_for_rois(jnp.asarray(gt), gt_box, roi, 8)
    )[0]
    assert t.mean() > 0.9


def test_mask_head_shapes_and_loss():
    head = MaskHead(num_classes=4, conv_layers=(32, 32, 32, 32), resolution=7)
    feats = [
        jnp.zeros((1, 32 // (2 ** i), 32 // (2 ** i), 8))
        for i in range(4)
    ]
    rois = jnp.asarray([[0, 0, 16, 16], [4, 4, 20, 20]], jnp.float32)
    bidx = jnp.zeros((2,), jnp.int32)
    v = head.init(jax.random.PRNGKey(0), feats, rois, bidx)
    logits = head.apply(v, feats, rois, bidx)
    assert logits.shape == (2, 14, 14, 4)

    labels = jnp.asarray([2, 0], jnp.int32)
    targets = jnp.zeros((2, 14, 14))
    valid = jnp.asarray([True, True])
    losses = mask_loss(logits, labels, targets, valid)
    assert np.isfinite(float(losses["loss_mask"]))

    # gradient flows to the mask head params
    def f(v):
        lg = head.apply(v, feats, rois, bidx)
        return mask_loss(lg, labels, targets, valid)["loss_mask"]

    g = jax.grad(f)(v)
    total = sum(
        float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)
    )
    assert total > 0


def test_paste_mask():
    mask = np.ones((4, 4), np.float32)
    out = paste_mask_in_image(mask, (2, 3, 7, 8), 12, 12)
    assert out[5, 5] == 1
    assert out[0, 0] == 0
    assert out.sum() == 36  # 6x6 box


def test_mask_rcnn_end_to_end_tiny():
    import pytest
    from paa_tpu.config import get_cfg
    from paa_tpu.modeling.two_stage import (
        build_faster_rcnn,
        faster_rcnn_train_step_fns,
    )

    cfg = get_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 5
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 50
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 20
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 40
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16

    model = build_faster_rcnn(cfg)
    hw = (64, 64)
    variables = model.init(jax.random.PRNGKey(0), hw)
    assert "mask_head" in variables["params"]

    loss_fn = faster_rcnn_train_step_fns(model, hw)
    images = jnp.zeros((1, *hw, 3), jnp.float32)
    gtb = jnp.asarray([[[4, 4, 30, 30], [0, 0, 0, 0]]], jnp.float32)
    gtl = jnp.asarray([[2, 0]], jnp.int32)
    gtm = np.zeros((1, 2, 32, 32), np.float32)
    gtm[0, 0, 8:24, 8:24] = 1.0
    sizes = jnp.asarray([[64.0, 64.0]])
    losses = jax.jit(loss_fn)(
        variables, images, gtb, gtl, sizes, jax.random.PRNGKey(1),
        jnp.asarray(gtm),
    )
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
