"""Flax FCOS head + location utilities.

Re-designs reference paa_core/modeling/rpn/fcos/fcos.py:13-117: anchor-free
per-location l/t/r/b regression; shared towers; centerness on the cls or
reg tower (CENTERNESS_ON_REG); reg outputs exp(pred) or, with
NORM_REG_TARGETS, relu(pred) left UN-scaled (training view) — the
postprocessor applies the per-level stride (the torch head's eval branch)
and the loss divides targets by stride.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Scale, conv, head_normal_init
from .paa_head import ConvTower


def compute_locations(feature_shapes, strides):
    """Per-level (H*W, 2) center locations: grid*stride + stride//2
    (reference paa.py:154-178 / fcos.py compute_locations)."""
    out = []
    for (h, w), stride in zip(feature_shapes, strides):
        sx = np.arange(0, w * stride, stride, dtype=np.float32)
        sy = np.arange(0, h * stride, stride, dtype=np.float32)
        gx, gy = np.meshgrid(sx, sy)
        pts = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)
        out.append(pts + stride // 2)
    return out


def decode_ltrb(preds, locations4):
    """FCOS decode: boxes from per-location distances. ``locations4`` is
    the (x, y, x, y) tiling of locations so the postprocessor can treat
    them like anchors."""
    x = locations4[..., 0]
    y = locations4[..., 1]
    return jnp.stack(
        [
            x - preds[..., 0],
            y - preds[..., 1],
            x + preds[..., 2],
            y + preds[..., 3],
        ],
        axis=-1,
    )


class FCOSHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    num_convs: int = 4
    num_levels: int = 5
    use_dcn_in_tower: bool = False
    prior_prob: float = 0.01
    norm_reg_targets: bool = False
    centerness_on_reg: bool = False
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
            self.num_classes, 3, padding=1, use_bias=True,
            kernel_init=head_normal_init,
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype, name="cls_logits",
        )
        bbox_pred = conv(
            4, 3, padding=1, use_bias=True, kernel_init=head_normal_init,
            dtype=self.dtype, name="bbox_pred",
        )
        centerness = conv(
            1, 3, padding=1, use_bias=True, kernel_init=head_normal_init,
            dtype=self.dtype, name="centerness",
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
            ctr_src = bt if self.centerness_on_reg else ct
            ctr.append(centerness(ctr_src).reshape(b, -1))
            reg = scales[l](bbox_pred(bt))
            if self.norm_reg_targets:
                reg = nn.relu(reg)
            else:
                reg = jnp.exp(reg)
            bbox_reg.append(reg.reshape(b, -1, 4))
        return {
            "cls_logits": jnp.concatenate(logits, axis=1),
            "box_regression": jnp.concatenate(bbox_reg, axis=1),
            "iou_pred": jnp.concatenate(ctr, axis=1),  # centerness
        }


def fcos_head_from_cfg(cfg, dtype=jnp.float32):
    return FCOSHead(
        num_classes=cfg.MODEL.FCOS.NUM_CLASSES - 1,
        in_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
        num_convs=cfg.MODEL.FCOS.NUM_CONVS,
        num_levels=len(cfg.MODEL.FCOS.FPN_STRIDES),
        use_dcn_in_tower=cfg.MODEL.FCOS.USE_DCN_IN_TOWER,
        prior_prob=cfg.MODEL.FCOS.PRIOR_PROB,
        norm_reg_targets=cfg.MODEL.FCOS.NORM_REG_TARGETS,
        centerness_on_reg=cfg.MODEL.FCOS.CENTERNESS_ON_REG,
        fused_gn=cfg.TPU.FUSED_GN,
        dcn_mode=cfg.TPU.DCN_MODE,
        dcn_window_margin=cfg.TPU.DCN_WINDOW_MARGIN,
        dtype=dtype,
    )
