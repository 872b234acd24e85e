"""Flax RetinaNet head + loss.

Re-designs reference paa_core/modeling/rpn/retinanet/:

- head (retinanet.py:13-90): plain conv+ReLU towers (NO GroupNorm, unlike
  PAA/ATSS/FCOS), A = 9 anchors/location (3 ratios x 3 octave scales),
  normal(0.01) init + focal-prior cls bias, no Scale modules;
- loss (loss.py:19-81): Matcher at FG/BG 0.5/0.4 with low-quality
  matches, between-thresholds discarded (-1); smooth-L1 on positives
  / (num_pos * BBOX_REG_WEIGHT); focal cls / (num_pos + N_images);
- inference (inference.py): per-class NMS at 0.4 + global top-100 —
  exactly the class-aware greedy NMS the shared postprocessor runs.

Normalization note: the reference normalizes by LOCAL (per-GPU) counts
here — RetinaNet's loss has no reduce_sum, unlike PAA/ATSS/FCOS — so
under pjit we reproduce per-shard semantics by dividing by global counts
(the global program sums what DDP would average).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.focal_loss import sigmoid_focal_loss
from ..structures.boxes import box_iou
from .box_coder import encode_box
from .layers import conv, head_normal_init
from .matcher import match_anchors


class PlainTower(nn.Module):
    """num_convs x [3x3 conv, ReLU] (no norm), shared across levels."""

    channels: int
    num_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = conv(
                self.channels, 3, padding=1, use_bias=True,
                kernel_init=head_normal_init, dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        return x


class RetinaNetHead(nn.Module):
    num_classes: int
    num_anchors: int = 9
    in_channels: int = 256
    num_convs: int = 4
    num_levels: int = 5
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        assert len(features) == self.num_levels
        cls_tower = PlainTower(
            self.in_channels, self.num_convs, dtype=self.dtype,
            name="cls_tower",
        )
        bbox_tower = PlainTower(
            self.in_channels, self.num_convs, dtype=self.dtype,
            name="bbox_tower",
        )
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_logits = conv(
            self.num_anchors * self.num_classes, 3, padding=1,
            use_bias=True, kernel_init=head_normal_init,
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype, name="cls_logits",
        )
        bbox_pred = conv(
            self.num_anchors * 4, 3, padding=1, use_bias=True,
            kernel_init=head_normal_init, dtype=self.dtype,
            name="bbox_pred",
        )

        logits, bbox_reg = [], []
        for feature in features:
            b = feature.shape[0]
            logits.append(
                cls_logits(cls_tower(feature)).reshape(
                    b, -1, self.num_classes
                )
            )
            bbox_reg.append(
                bbox_pred(bbox_tower(feature)).reshape(b, -1, 4)
            )
        return {
            "cls_logits": jnp.concatenate(logits, axis=1),
            "box_regression": jnp.concatenate(bbox_reg, axis=1),
        }


def retinanet_head_from_cfg(cfg, dtype=jnp.float32):
    num_anchors = (
        len(cfg.MODEL.RETINANET.ASPECT_RATIOS)
        * cfg.MODEL.RETINANET.SCALES_PER_OCTAVE
    )
    return RetinaNetHead(
        num_classes=cfg.MODEL.RETINANET.NUM_CLASSES - 1,
        num_anchors=num_anchors,
        in_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
        num_convs=cfg.MODEL.RETINANET.NUM_CONVS,
        num_levels=len(cfg.MODEL.RETINANET.ANCHOR_STRIDES),
        prior_prob=cfg.MODEL.RETINANET.PRIOR_PROB,
        dtype=dtype,
    )


@dataclass(frozen=True)
class RetinaNetLossConfig:
    gamma: float = 2.0
    alpha: float = 0.25
    fg_iou_threshold: float = 0.5
    bg_iou_threshold: float = 0.4
    bbox_reg_beta: float = 0.11
    bbox_reg_weight: float = 4.0

    @staticmethod
    def from_cfg(cfg):
        return RetinaNetLossConfig(
            gamma=cfg.MODEL.RETINANET.LOSS_GAMMA,
            alpha=cfg.MODEL.RETINANET.LOSS_ALPHA,
            fg_iou_threshold=cfg.MODEL.RETINANET.FG_IOU_THRESHOLD,
            bg_iou_threshold=cfg.MODEL.RETINANET.BG_IOU_THRESHOLD,
            bbox_reg_beta=cfg.MODEL.RETINANET.BBOX_REG_BETA,
            bbox_reg_weight=cfg.MODEL.RETINANET.BBOX_REG_WEIGHT,
        )


def smooth_l1(pred, target, beta):
    n = jnp.abs(pred - target)
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def retinanet_loss(outputs, gt_boxes, gt_labels, anchors, level_counts,
                   lc, num_shards=1):
    cls_logits = outputs["cls_logits"].astype(jnp.float32)
    box_regression = outputs["box_regression"].astype(jnp.float32)
    anchors = jnp.asarray(anchors, jnp.float32)
    gt_boxes = gt_boxes.astype(jnp.float32)
    gt_valid = gt_labels > 0
    n_images = gt_labels.shape[0]

    iou = box_iou(gt_boxes, anchors[None])
    matched = match_anchors(
        iou, gt_valid, lc.fg_iou_threshold, lc.bg_iou_threshold,
        allow_low_quality_matches=True,
    )
    clamped = jnp.maximum(matched, 0)
    labels = jnp.where(
        matched >= 0,
        jnp.take_along_axis(gt_labels, clamped, axis=1),
        jnp.where(matched == -2, -1, 0),
    ).astype(jnp.int32)
    matched_boxes = jnp.take_along_axis(
        gt_boxes, clamped[:, :, None], axis=1
    )
    reg_targets = encode_box(matched_boxes, anchors[None])

    pos = labels > 0
    posf = pos.astype(jnp.float32)
    num_pos = posf.sum()

    reg = smooth_l1(box_regression, reg_targets, lc.bbox_reg_beta)
    reg_loss = (reg * posf[..., None]).sum() / jnp.maximum(
        num_pos * lc.bbox_reg_weight, 1.0
    )

    cls_loss = sigmoid_focal_loss(
        cls_logits, labels, lc.gamma, lc.alpha
    ).sum() / (num_pos + n_images)

    return {
        "loss_retina_cls": cls_loss,
        "loss_retina_reg": reg_loss,
        "num_pos": num_pos,
    }
