"""Flax ATSS head.

Re-designs reference paa_core/modeling/rpn/atss/atss.py:100-191: shared
towers like PAA plus a ``centerness`` branch on the bbox tower, per-level
Scale, focal-prior cls bias, ReLU on bbox_pred (+bias init 4) in 'POINT'
regression mode. Outputs flattened per level like the PAA head.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import Scale, conv, head_normal_init
from .paa_head import ConvTower


class ATSSHead(nn.Module):
    num_classes: int  # WITHOUT background
    num_anchors: int = 1
    in_channels: int = 256
    num_convs: int = 4
    num_levels: int = 5
    use_dcn_in_tower: bool = False
    prior_prob: float = 0.01
    regression_type: str = "BOX"
    # centerness/IoU branch: off only in the pure-RetinaNet ablation
    # (atss/ret_R_50_FPN_1.5x.yaml sets USE_CENTERNESS_PRED and
    # USE_IOU_PRED both False)
    use_branch: bool = True
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
            self.num_anchors * self.num_classes, 3, padding=1,
            use_bias=True, kernel_init=head_normal_init,
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype, name="cls_logits",
        )
        bbox_bias = (
            nn.initializers.constant(4.0)
            if self.regression_type == "POINT"
            else nn.initializers.zeros
        )
        bbox_pred = conv(
            self.num_anchors * 4, 3, padding=1, use_bias=True,
            kernel_init=head_normal_init, bias_init=bbox_bias,
            dtype=self.dtype, name="bbox_pred",
        )
        centerness = (
            conv(
                self.num_anchors, 3, padding=1, use_bias=True,
                kernel_init=head_normal_init, dtype=self.dtype,
                name="centerness",
            )
            if self.use_branch
            else None
        )
        scales = [
            Scale(1.0, name=f"scale{l}") for l in range(self.num_levels)
        ]

        logits, bbox_reg, ctr = [], [], []
        for l, feature in enumerate(features):
            ct = cls_tower(feature)
            bt = bbox_tower(feature)
            b = feature.shape[0]
            logits.append(
                cls_logits(ct).reshape(b, -1, self.num_classes)
            )
            reg = scales[l](bbox_pred(bt))
            if self.regression_type == "POINT":
                reg = nn.relu(reg)
            bbox_reg.append(reg.reshape(b, -1, 4))
            if centerness is not None:
                ctr.append(centerness(bt).reshape(b, -1))
        out = {
            "cls_logits": jnp.concatenate(logits, axis=1),
            "box_regression": jnp.concatenate(bbox_reg, axis=1),
        }
        if centerness is not None:
            # the postprocessor fuses sqrt(cls * sigmoid(branch)) — the
            # same formula as PAA's iou_pred branch, so it shares the key
            out["iou_pred"] = jnp.concatenate(ctr, axis=1)
        return out


def atss_head_from_cfg(cfg, dtype=jnp.float32):
    num_anchors = (
        len(cfg.MODEL.ATSS.ASPECT_RATIOS) * cfg.MODEL.ATSS.SCALES_PER_OCTAVE
    )
    if cfg.MODEL.ATSS.REGRESSION_TYPE == "POINT":
        assert num_anchors == 1
    return ATSSHead(
        num_classes=cfg.MODEL.ATSS.NUM_CLASSES - 1,
        num_anchors=num_anchors,
        in_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
        num_convs=cfg.MODEL.ATSS.NUM_CONVS,
        num_levels=len(cfg.MODEL.ATSS.ANCHOR_STRIDES),
        use_dcn_in_tower=cfg.MODEL.ATSS.USE_DCN_IN_TOWER,
        prior_prob=cfg.MODEL.ATSS.PRIOR_PROB,
        regression_type=cfg.MODEL.ATSS.REGRESSION_TYPE,
        use_branch=(
            cfg.MODEL.ATSS.USE_CENTERNESS_PRED
            or cfg.MODEL.ATSS.USE_IOU_PRED
        ),
        fused_gn=cfg.TPU.FUSED_GN,
        dcn_mode=cfg.TPU.DCN_MODE,
        dcn_window_margin=cfg.TPU.DCN_WINDOW_MARGIN,
        dtype=dtype,
    )
