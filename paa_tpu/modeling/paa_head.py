"""Flax PAA head.

Re-designs reference paa_core/modeling/rpn/paa/paa.py:15-108: shared
4-conv cls/bbox towers (GroupNorm(32)+ReLU) applied to all FPN levels,
``cls_logits`` (A*C), per-level learnable ``Scale`` on ``bbox_pred`` (A*4),
and the ``iou_pred`` (A*1) branch. Focal-prior bias init on cls_logits
(paa.py:84-87); all head convs normal(0.01)/bias 0 (paa.py:77-83).

Outputs are returned flattened per level as (B, H*W*A, C) in the
reference's ``permute_and_flatten`` order (rpn/utils.py:10-24): anchor
index varies fastest, then x, then y — identical to the anchor grid
order, so downstream code indexes anchors and predictions identically.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm32, Scale, conv, head_normal_init


class ConvTower(nn.Module):
    """num_convs x [3x3 conv, GN(32), ReLU], shared across levels."""

    channels: int
    num_convs: int = 4
    use_dcn_last: bool = False
    fused_gn: bool = False  # TPU.FUSED_GN: one-pass GN+ReLU kernel
    dcn_mode: Any = None  # None = process default (set_default_dcn_mode)
    dcn_window_margin: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            if self.use_dcn_last and i == self.num_convs - 1:
                from ..ops.dcn import DeformConv

                x = DeformConv(
                    features=self.channels, kernel_size=3, strides=1,
                    padding=1, modulated=True, use_bias=True,
                    kernel_init=head_normal_init, mode=self.dcn_mode,
                    window_margin=self.dcn_window_margin,
                    name=f"conv{i}",
                )(x)
            else:
                x = conv(
                    self.channels, 3, padding=1, use_bias=True,
                    kernel_init=head_normal_init, dtype=self.dtype,
                    name=f"conv{i}",
                )(x)
            x = GroupNorm32(
                self.channels, fused_relu=self.fused_gn, name=f"gn{i}"
            )(x)
            if not self.fused_gn:
                x = nn.relu(x)
        return x


class PAAHead(nn.Module):
    num_classes: int  # WITHOUT background (cfg NUM_CLASSES - 1)
    num_anchors: int = 1
    in_channels: int = 256
    num_convs: int = 4
    num_levels: int = 5
    use_iou_pred: bool = True
    use_dcn_in_tower: bool = False
    prior_prob: float = 0.01
    fused_gn: bool = False
    dcn_mode: Any = None
    dcn_window_margin: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        assert len(features) == self.num_levels
        cls_tower = ConvTower(
            self.in_channels, self.num_convs,
            use_dcn_last=self.use_dcn_in_tower, fused_gn=self.fused_gn,
            dcn_mode=self.dcn_mode,
            dcn_window_margin=self.dcn_window_margin,
            dtype=self.dtype, name="cls_tower",
        )
        bbox_tower = ConvTower(
            self.in_channels, self.num_convs,
            use_dcn_last=self.use_dcn_in_tower, fused_gn=self.fused_gn,
            dcn_mode=self.dcn_mode,
            dcn_window_margin=self.dcn_window_margin,
            dtype=self.dtype, name="bbox_tower",
        )
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_logits = conv(
            self.num_anchors * self.num_classes, 3, padding=1, use_bias=True,
            kernel_init=head_normal_init,
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype, name="cls_logits",
        )
        bbox_pred = conv(
            self.num_anchors * 4, 3, padding=1, use_bias=True,
            kernel_init=head_normal_init, dtype=self.dtype, name="bbox_pred",
        )
        iou_pred = (
            conv(
                self.num_anchors, 3, padding=1, use_bias=True,
                kernel_init=head_normal_init, dtype=self.dtype,
                name="iou_pred",
            )
            if self.use_iou_pred
            else None
        )
        scales = [
            Scale(1.0, name=f"scale{l}") for l in range(self.num_levels)
        ]

        logits, bbox_reg, iou_out = [], [], []
        for l, feature in enumerate(features):
            ct = cls_tower(feature)
            bt = bbox_tower(feature)
            b = feature.shape[0]
            # flatten (B,H,W,A*K) -> (B, H*W*A, K): y, x, a order
            logit = cls_logits(ct)
            logits.append(logit.reshape(b, -1, self.num_classes))
            reg = scales[l](bbox_pred(bt))
            bbox_reg.append(reg.reshape(b, -1, 4))
            if iou_pred is not None:
                iou_out.append(iou_pred(bt).reshape(b, -1))

        out = {
            "cls_logits": jnp.concatenate(logits, axis=1),
            "box_regression": jnp.concatenate(bbox_reg, axis=1),
        }
        if iou_pred is not None:
            out["iou_pred"] = jnp.concatenate(iou_out, axis=1)
        return out


def paa_head_from_cfg(cfg, dtype=jnp.float32):
    num_anchors = (
        len(cfg.MODEL.PAA.ASPECT_RATIOS) * cfg.MODEL.PAA.SCALES_PER_OCTAVE
    )
    return PAAHead(
        num_classes=cfg.MODEL.PAA.NUM_CLASSES - 1,
        num_anchors=num_anchors,
        in_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
        num_convs=cfg.MODEL.PAA.NUM_CONVS,
        num_levels=len(cfg.MODEL.PAA.ANCHOR_STRIDES),
        use_iou_pred=cfg.MODEL.PAA.USE_IOU_PRED,
        use_dcn_in_tower=cfg.MODEL.PAA.USE_DCN_IN_TOWER,
        prior_prob=cfg.MODEL.PAA.PRIOR_PROB,
        fused_gn=cfg.TPU.FUSED_GN,
        dcn_mode=cfg.TPU.DCN_MODE,
        dcn_window_margin=cfg.TPU.DCN_WINDOW_MARGIN,
        dtype=dtype,
    )
