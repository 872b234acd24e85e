"""ROI box head (Faster R-CNN second stage), static-shape.

Re-designs reference paa_core/modeling/roi_heads/box_head/:

- FPN2MLPFeatureExtractor: multilevel ROIAlign 7x7 (POOLER_SCALES
  1/4..1/32, sampling ratio 2) -> flatten -> FC 1024 -> FC 1024;
- FPNPredictor: cls_score (C+1 softmax classes) + class-specific
  bbox_pred (C*4... reference uses num_classes*4 including background);
- loss (roi_heads/box_head/loss.py): matcher at ROI_HEADS FG/BG 0.5/0.5
  (no low-quality matches), balanced sampling 512 @ 25% positive,
  softmax cross-entropy + smooth-L1 on the matched class's deltas with
  BBOX_REG_WEIGHTS (10, 10, 5, 5);
- inference (roi_heads/box_head/inference.py PostProcessor): softmax,
  per-class decode, score threshold, per-class NMS 0.5, top 100.

Proposals are fixed-capacity with validity masks; training appends the
GT boxes to the proposals (add_gt_proposals) by overwriting the
lowest-scoring slots.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.nms import nms_auto as nms
from ..ops.nms import nms_batched_auto as nms_batched
from ..ops.roi_align import multilevel_roi_align
from ..structures.boxes import box_iou, clip_to_image
from .box_coder import decode_box, encode_box
from .layers import GroupNorm32, conv, kaiming_uniform_a1
from .retinanet_head import smooth_l1
from .rpn import balanced_sample

_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def _make_fc(x, dim, use_gn, name):
    """make_layers.py make_fc: kaiming_uniform(a=1) Linear; with GN the
    Linear drops its bias and a GroupNorm follows."""
    x = nn.Dense(
        dim, use_bias=not use_gn, kernel_init=kaiming_uniform_a1,
        name=name,
    )(x)
    if use_gn:
        x = GroupNorm32(dim, name=f"{name}_gn")(x[:, None, None, :])[
            :, 0, 0, :
        ]
    return x


def _fpn_predictor(x, num_classes):
    """FPNPredictor (roi_box_predictors.py): cls_score normal(0.01) +
    class-specific bbox_pred normal(0.001)."""
    r = x.shape[0]
    cls_logits = nn.Dense(
        num_classes,
        kernel_init=nn.initializers.normal(0.01),
        name="cls_score",
    )(x)
    box_deltas = nn.Dense(
        num_classes * 4,
        kernel_init=nn.initializers.normal(0.001),
        name="bbox_pred",
    )(x)
    return cls_logits, box_deltas.reshape(r, num_classes, 4)


class FPN2MLPBoxHead(nn.Module):
    """Pooler + 2 FC + (cls, class-specific box deltas)."""

    num_classes: int  # INCLUDING background
    mlp_dim: int = 1024
    resolution: int = 7
    scales: tuple = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 2
    use_gn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, proposals, proposal_batch_idx):
        """features: first 4 FPN maps (P2..P5 or P3..P6 per scales);
        proposals: (R, 4); proposal_batch_idx: (R,)."""
        x = multilevel_roi_align(
            features, proposals, proposal_batch_idx,
            (self.resolution, self.resolution), self.scales,
            self.sampling_ratio,
        )  # (R, 7, 7, C)
        r = x.shape[0]
        x = x.reshape(r, -1)
        x = nn.relu(_make_fc(x, self.mlp_dim, self.use_gn, "fc6"))
        x = nn.relu(_make_fc(x, self.mlp_dim, self.use_gn, "fc7"))
        return _fpn_predictor(x, self.num_classes)


class FPNXconvBoxHead(nn.Module):
    """FPNXconv1fcFeatureExtractor + FPNPredictor
    (roi_box_feature_extractors.py:86-145): pooler -> N stacked 3x3
    convs (normal(0.01), GN optional, dilation) -> flatten -> FC ->
    predictors. Used by the gn_baselines Xconv1fc configs."""

    num_classes: int  # INCLUDING background
    mlp_dim: int = 1024
    conv_head_dim: int = 256
    num_stacked_convs: int = 4
    dilation: int = 1
    resolution: int = 7
    scales: tuple = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 2
    use_gn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, proposals, proposal_batch_idx):
        x = multilevel_roi_align(
            features, proposals, proposal_batch_idx,
            (self.resolution, self.resolution), self.scales,
            self.sampling_ratio,
        )
        for i in range(self.num_stacked_convs):
            x = conv(
                self.conv_head_dim, 3, padding=self.dilation,
                dilation=self.dilation, use_bias=not self.use_gn,
                kernel_init=nn.initializers.normal(0.01),
                dtype=self.dtype, name=f"xconv{i + 1}",
            )(x)
            if self.use_gn:
                x = GroupNorm32(self.conv_head_dim,
                                name=f"xconv{i + 1}_gn")(x)
            x = nn.relu(x)
        r = x.shape[0]
        x = x.astype(jnp.float32).reshape(r, -1)
        x = nn.relu(_make_fc(x, self.mlp_dim, use_gn=False, name="fc6"))
        return _fpn_predictor(x, self.num_classes)


@dataclass(frozen=True)
class ROIBoxConfig:
    num_classes: int = 81
    fg_iou_threshold: float = 0.5
    bg_iou_threshold: float = 0.5
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 100

    @staticmethod
    def from_cfg(cfg):
        r = cfg.MODEL.ROI_HEADS
        return ROIBoxConfig(
            num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
            fg_iou_threshold=r.FG_IOU_THRESHOLD,
            bg_iou_threshold=r.BG_IOU_THRESHOLD,
            batch_size_per_image=r.BATCH_SIZE_PER_IMAGE,
            positive_fraction=r.POSITIVE_FRACTION,
            score_thresh=r.SCORE_THRESH,
            nms_thresh=r.NMS,
            detections_per_img=r.DETECTIONS_PER_IMG,
        )


def subsample_proposals(proposals, proposal_valid, gt_boxes, gt_labels,
                        bc: ROIBoxConfig, rng):
    """Per image: add GTs to proposals, match, balanced-sample a fixed
    512-roi training batch. Returns (rois (S,4), roi_labels (S,),
    reg_targets (S,4), roi_valid (S,))."""
    gt_valid = gt_labels > 0
    num_gt = gt_labels.shape[0]
    # append gts by overwriting the tail slots (valid proposals stay)
    proposals = jnp.concatenate([proposals, gt_boxes], axis=0)
    proposal_valid = jnp.concatenate([proposal_valid, gt_valid], axis=0)
    # guarantee at least batch_size_per_image slots for the fixed-S draw
    deficit = bc.batch_size_per_image - proposals.shape[0]
    if deficit > 0:
        proposals = jnp.concatenate(
            [proposals, jnp.zeros((deficit, 4), proposals.dtype)], axis=0
        )
        proposal_valid = jnp.concatenate(
            [proposal_valid, jnp.zeros((deficit,), bool)], axis=0
        )

    iou = box_iou(gt_boxes[None], proposals[None])[0]  # (G, P)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_vals = iou.max(axis=0)
    matched_idx = iou.argmax(axis=0).astype(jnp.int32)
    labels = jnp.where(
        matched_vals >= bc.fg_iou_threshold,
        jnp.take_along_axis(gt_labels, matched_idx, axis=0),
        jnp.where(matched_vals >= bc.bg_iou_threshold, -1, 0),
    )
    labels = jnp.where(proposal_valid, labels, -1)  # padding is ignored

    pos_sel, neg_sel = balanced_sample(
        labels, rng, bc.batch_size_per_image, bc.positive_fraction
    )
    sel = pos_sel | neg_sel
    # compress to a fixed S slots via top-k on selection
    s = bc.batch_size_per_image
    pri = jnp.where(sel, 1.0, 0.0) + jnp.where(pos_sel, 1.0, 0.0)
    _, idx = jax.lax.top_k(pri, s)
    roi_valid = sel[idx]
    rois = proposals[idx]
    roi_labels = jnp.where(roi_valid, labels[idx], -1)
    roi_gt_idx = matched_idx[idx]
    matched_boxes = gt_boxes[roi_gt_idx]
    reg_targets = encode_box(matched_boxes, rois, weights=_REG_WEIGHTS)
    return (rois, roi_labels.astype(jnp.int32), reg_targets, roi_valid,
            roi_gt_idx, matched_boxes)


def roi_box_loss(cls_logits, box_deltas, roi_labels, reg_targets,
                 roi_valid):
    """FastRCNNLossComputation (box_head/loss.py): softmax CE averaged
    over sampled rois; smooth-L1 (beta=1) on the matched class's deltas,
    summed / num_sampled."""
    validf = (roi_valid & (roi_labels >= 0)).astype(jnp.float32)
    n = jnp.maximum(validf.sum(), 1.0)

    labels_for_ce = jnp.maximum(roi_labels, 0)
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(
        logp, labels_for_ce[:, None], axis=-1
    )[:, 0]
    loss_cls = (ce * validf).sum() / n

    pos = (roi_labels > 0) & roi_valid
    posf = pos.astype(jnp.float32)
    cls_deltas = jnp.take_along_axis(
        box_deltas.astype(jnp.float32),
        labels_for_ce[:, None, None].repeat(4, axis=-1),
        axis=1,
    )[:, 0]
    reg = smooth_l1(cls_deltas, reg_targets, beta=1.0)
    loss_reg = (reg * posf[:, None]).sum() / n

    return {"loss_classifier": loss_cls, "loss_box_reg": loss_reg}


def roi_box_postprocess(cls_logits, box_deltas, rois, roi_valid,
                        image_size, bc: ROIBoxConfig):
    """PostProcessor for one image (box_head/inference.py): softmax,
    class-specific decode, threshold, per-class NMS, top
    detections_per_img."""
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    c = probs.shape[1]
    boxes = decode_box(
        box_deltas.astype(jnp.float32),
        rois[:, None, :].repeat(c, axis=1),
        weights=_REG_WEIGHTS,
    )  # (R, C, 4)
    boxes = clip_to_image(
        boxes.reshape(-1, 4), image_size.astype(jnp.float32)
    ).reshape(-1, c, 4)

    # skip background column 0
    scores = probs[:, 1:].reshape(-1)  # (R*(C-1),)
    flat_boxes = boxes[:, 1:, :].reshape(-1, 4)
    labels = jnp.tile(
        jnp.arange(1, c, dtype=jnp.int32)[None], (probs.shape[0], 1)
    ).reshape(-1)
    valid = (
        (scores > bc.score_thresh)
        & jnp.repeat(roi_valid, c - 1)
    )
    kidx, kscores, kvalid = nms(
        flat_boxes, scores, labels, valid, bc.nms_thresh,
        bc.detections_per_img, class_aware=True,
    )
    return {
        "boxes": flat_boxes[kidx],
        "scores": jnp.where(kvalid, kscores, 0.0),
        "labels": jnp.where(kvalid, labels[kidx], 0),
        "valid": kvalid,
    }


def roi_box_postprocess_batched(cls_logits, box_deltas, rois, roi_valid,
                                image_sizes, bc: ROIBoxConfig):
    """Whole-batch PostProcessor: same semantics as
    vmap(roi_box_postprocess) but with ONE batched NMS dispatch (the
    lock-step Pallas kernel on TPU, VMEM-chunked over images).

    cls_logits (B, R, C); box_deltas (B, R, C, 4); rois (B, R, 4);
    roi_valid (B, R); image_sizes (B, 2).
    """
    bsz, r, c = cls_logits.shape
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    boxes = decode_box(
        box_deltas.astype(jnp.float32),
        jnp.broadcast_to(rois[:, :, None, :], (bsz, r, c, 4)),
        weights=_REG_WEIGHTS,
    )  # (B, R, C, 4)
    boxes = clip_to_image(
        boxes.reshape(bsz, -1, 4), image_sizes.astype(jnp.float32)
    ).reshape(bsz, r, c, 4)

    # skip background column 0
    scores = probs[:, :, 1:].reshape(bsz, -1)  # (B, R*(C-1))
    flat_boxes = boxes[:, :, 1:, :].reshape(bsz, -1, 4)
    labels = jnp.tile(
        jnp.arange(1, c, dtype=jnp.int32)[None, None], (bsz, r, 1)
    ).reshape(bsz, -1)
    valid = (
        (scores > bc.score_thresh)
        & jnp.repeat(roi_valid, c - 1, axis=1)
    )
    kidx, kscores, kvalid = nms_batched(
        flat_boxes, scores, labels, valid, bc.nms_thresh,
        bc.detections_per_img, class_aware=True,
    )
    return {
        "boxes": jnp.take_along_axis(
            flat_boxes, kidx[..., None], axis=1
        ),
        "scores": jnp.where(kvalid, kscores, 0.0),
        "labels": jnp.where(
            kvalid, jnp.take_along_axis(labels, kidx, axis=1), 0
        ),
        "valid": kvalid,
    }


class Res5ROIBoxHead(nn.Module):
    """C4 box head (reference roi_heads/box_head
    ResNet50Conv5ROIFeatureExtractor + FastRCNNPredictor): ROIAlign
    14x14 at 1/16 on the single C4 map, the res5 stage (3 bottlenecks,
    stride 2 in the first), global average pool, linear cls +
    class-specific box deltas."""

    num_classes: int  # INCLUDING background
    resolution: int = 14
    scale: float = 1.0 / 16
    sampling_ratio: int = 2
    num_groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, proposals, proposal_batch_idx,
                 return_features=False):
        """return_features: also return the (R, 7, 7, 2048) res5 ROI
        features — the C4 Mask R-CNN's shared extractor output
        (reference roi_heads.py:19 assigns the BOX head's
        ResNet50Conv5ROIFeatureExtractor to the mask head, so mask
        features come from the SAME weights; FasterRCNN.mask calls this
        with the flag to reproduce that sharing)."""
        from ..ops.roi_align import roi_align
        from .resnet import Bottleneck

        x = roi_align(
            features[0], proposals, proposal_batch_idx,
            (self.resolution, self.resolution), self.scale,
            self.sampling_ratio,
        )
        bottleneck = self.num_groups * self.width_per_group * 8
        for b in range(3):
            x = Bottleneck(
                bottleneck_channels=bottleneck,
                out_channels=2048,
                stride=2 if b == 0 else 1,
                num_groups=self.num_groups,
                dtype=self.dtype,
                name=f"layer4_{b}",
            )(x)
        res5 = x
        x = x.astype(jnp.float32).mean(axis=(1, 2))
        r = x.shape[0]
        cls_logits = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(0.01),
            name="cls_score",
        )(x)
        box_deltas = nn.Dense(
            self.num_classes * 4,
            kernel_init=nn.initializers.normal(0.001),
            name="bbox_pred",
        )(x)
        deltas = box_deltas.reshape(r, self.num_classes, 4)
        if return_features:
            return cls_logits, deltas, res5
        return cls_logits, deltas
