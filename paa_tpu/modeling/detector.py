"""Model assembly.

Mirrors the reference's meta-architecture wiring
(paa_core/modeling/detector/generalized_rcnn.py:16-65 and
rpn/rpn.py:203-216 head dispatch) as a functional bundle: a Flax module
(backbone + dense head) plus the anchor generator and static shape
arithmetic. Loss and post-processing are pure functions in
``paa_loss.py`` / ``paa_inference.py`` — training vs eval is an explicit
caller choice rather than module state.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .anchors import (
    AnchorGenerator,
    make_anchor_generator_atss,
    make_anchor_generator_paa,
    make_anchor_generator_retinanet,
)
from .box_coder import BoxCoder
from .fpn import ResNetFPNBackbone
from .paa_head import paa_head_from_cfg
from .resnet import resnet_from_cfg


class DenseDetector(nn.Module):
    """backbone -> dense head; the RPN_ONLY=True path of GeneralizedRCNN."""

    backbone: nn.Module
    head: nn.Module

    def __call__(self, images):
        features = self.backbone(images)
        return self.head(features)


@dataclass
class DetectionModel:
    """A built detection model: module + anchors + static-shape helpers."""

    cfg: Any
    module: nn.Module
    anchor_generator: AnchorGenerator
    box_coder: BoxCoder
    strides: Tuple[int, ...]

    def feature_shapes(self, image_hw):
        """Per-level (H, W) for a padded input (H, W). Requires the padded
        dims to be multiples of 32 (DATALOADER.SIZE_DIVISIBILITY), under
        which every level dim equals ceil(dim / stride)."""
        h, w = image_hw
        return [
            (int(math.ceil(h / s)), int(math.ceil(w / s)))
            for s in self.strides
        ]

    def anchors_for(self, image_hw):
        """Concatenated (N, 4) anchors + per-level counts for a padded
        input shape."""
        return self.anchor_generator(self.feature_shapes(image_hw))

    def init(self, rng, image_hw, batch_size=1, dtype=jnp.float32):
        images = jnp.zeros((batch_size, *image_hw, 3), dtype=dtype)
        return self.module.init(rng, images)


def build_backbone(cfg, dtype=jnp.float32):
    body = cfg.MODEL.BACKBONE.CONV_BODY
    resnet = resnet_from_cfg(cfg, dtype=dtype)
    out_channels = cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS
    if body.endswith("FPN-RETINANET"):
        return ResNetFPNBackbone(
            resnet=resnet,
            out_channels=out_channels,
            skip_c2=True,
            use_p6p7=True,
            p6p7_from_c5=cfg.MODEL.RETINANET.USE_C5,
            dtype=dtype,
        )
    elif body.endswith("FPN"):
        return ResNetFPNBackbone(
            resnet=resnet,
            out_channels=out_channels,
            skip_c2=False,
            use_p6p7=False,
            dtype=dtype,
        )
    raise NotImplementedError(f"CONV_BODY {body} not supported")


def build_detection_model(cfg, dtype=None) -> DetectionModel:
    if dtype is None:
        dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    backbone = build_backbone(cfg, dtype=dtype)
    if cfg.MODEL.PAA_ON:
        head = paa_head_from_cfg(cfg, dtype=dtype)
        anchor_gen = make_anchor_generator_paa(cfg)
        strides = tuple(cfg.MODEL.PAA.ANCHOR_STRIDES)
    else:
        raise NotImplementedError(
            "only the PAA head is implemented so far; ATSS/FCOS/RetinaNet "
            "are tracked for later rounds"
        )
    module = DenseDetector(backbone=backbone, head=head)
    return DetectionModel(
        cfg=cfg,
        module=module,
        anchor_generator=anchor_gen,
        box_coder=BoxCoder(cfg),
        strides=strides,
    )
