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
    head_type: str = "paa"

    def loss_fn(self):
        """Return (loss_callable, loss_config) for this head.

        loss_callable(outputs, gt_boxes, gt_labels, anchors, counts,
        loss_config, num_shards) -> dict of losses.
        """
        if self.head_type == "paa":
            from .paa_loss import PAALossConfig, paa_loss

            return paa_loss, PAALossConfig.from_cfg(self.cfg)
        elif self.head_type == "atss":
            from .atss_loss import ATSSLossConfig, atss_loss

            return atss_loss, ATSSLossConfig.from_cfg(self.cfg)
        elif self.head_type == "fcos":
            from .fcos_loss import FCOSLossConfig, fcos_loss

            return fcos_loss, FCOSLossConfig.from_cfg(self.cfg)
        elif self.head_type == "retinanet":
            from .retinanet_head import RetinaNetLossConfig, retinanet_loss

            return retinanet_loss, RetinaNetLossConfig.from_cfg(self.cfg)
        raise NotImplementedError(self.head_type)

    def postprocess(self, outputs, image_sizes, anchors, level_counts):
        """Head-appropriate post-processing (shared static-shape engine)."""
        from .paa_inference import paa_postprocess

        pp = self.postprocess_config()
        if self.head_type == "fcos":
            from .fcos_head import decode_ltrb

            reg_scales = (
                tuple(float(s) for s in self.cfg.MODEL.FCOS.FPN_STRIDES)
                if self.cfg.MODEL.FCOS.NORM_REG_TARGETS
                else None
            )
            return paa_postprocess(
                outputs, image_sizes, anchors, level_counts, pp,
                decode_fn=decode_ltrb, reg_scales=reg_scales,
            )
        return paa_postprocess(
            outputs, image_sizes, anchors, level_counts, pp
        )

    def postprocess_config(self):
        from .paa_inference import PostProcessConfig

        if self.head_type == "paa":
            return PostProcessConfig.from_cfg(self.cfg)
        elif self.head_type == "fcos":
            c = self.cfg.MODEL.FCOS
            return PostProcessConfig(
                pre_nms_thresh=c.INFERENCE_TH,
                pre_nms_top_n=c.PRE_NMS_TOP_N,
                nms_thresh=c.NMS_TH,
                detections_per_img=self.cfg.TEST.DETECTIONS_PER_IMG,
                num_classes=c.NUM_CLASSES - 1,
                score_voting=False,
            )
        elif self.head_type == "retinanet":
            c = self.cfg.MODEL.RETINANET
            return PostProcessConfig(
                pre_nms_thresh=c.INFERENCE_TH,
                pre_nms_top_n=c.PRE_NMS_TOP_N,
                nms_thresh=c.NMS_TH,
                detections_per_img=self.cfg.TEST.DETECTIONS_PER_IMG,
                num_classes=c.NUM_CLASSES - 1,
                score_voting=False,
            )
        elif self.head_type == "atss":
            # ATSS fuses sqrt(cls*centerness) exactly like PAA fuses
            # sqrt(cls*iou_pred) (atss/inference.py:50-78); no voting.
            c = self.cfg.MODEL.ATSS
            return PostProcessConfig(
                pre_nms_thresh=c.INFERENCE_TH,
                pre_nms_top_n=c.PRE_NMS_TOP_N,
                nms_thresh=c.NMS_TH,
                detections_per_img=self.cfg.TEST.DETECTIONS_PER_IMG,
                num_classes=c.NUM_CLASSES - 1,
                score_voting=False,
            )
        raise NotImplementedError(self.head_type)

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

    # -- engine protocol (shared with TwoStageModel) ---------------------

    @property
    def train_batch_keys(self):
        # image_sizes rides along for the uint8 device-normalize path
        # (ops/image_norm.py); float32 batches ignore it
        return ("images", "gt_boxes", "gt_labels", "image_sizes")

    def make_bucket_train_step(self, hw, param_label_tree=None,
                               num_shards=1):
        """train_step(state, batch) -> (state, metrics) for one bucket
        shape; jit with engine.train_step.jit_train_step."""
        from ..engine.train_step import make_train_step

        loss_call, loss_cfg = self.loss_fn()
        anchors, counts = self.anchors_for(hw)
        return make_train_step(
            self.module.apply, anchors, counts, loss_cfg,
            param_label_tree=param_label_tree, num_shards=num_shards,
            loss_call=loss_call,
            normalize=(
                self.cfg.INPUT.PIXEL_MEAN, self.cfg.INPUT.PIXEL_STD
            ),
        )

    def make_eval_fn(self, variables, mesh=None):
        """eval_fn(images, image_sizes) -> detection dict; retraces per
        input shape (anchors are static per shape). With a multi-device
        ``mesh`` the batch shards over the data axis (shard_map).

        With TPU.DCN_MODE='optimistic' the dict gains a per-image
        ``dcn_escaped`` bool: True where a DCN sample escaped its onehot
        window, so the caller must re-run that image through a
        gather-pinned model for CUDA-exact results (the inference engine
        does this automatically)."""
        from ..ops.image_norm import maybe_device_normalize
        from ..utils.comm import shard_eval_fn

        optimistic = self.cfg.TPU.DCN_MODE == "optimistic"
        mean, std = self.cfg.INPUT.PIXEL_MEAN, self.cfg.INPUT.PIXEL_STD

        def body(variables, images, image_sizes):
            images = maybe_device_normalize(
                images, image_sizes, mean, std
            )
            if optimistic:
                outputs, inter = self.module.apply(
                    variables, images, mutable=["intermediates"]
                )
                flags = [
                    f
                    for path, f in jax.tree_util.tree_leaves_with_path(
                        inter["intermediates"]
                    )
                    if "dcn_escaped" in jax.tree_util.keystr(path)
                ]
            else:
                outputs = self.module.apply(variables, images)
            hw = images.shape[1:3]
            anchors, counts = self.anchors_for(hw)
            det = self.postprocess(
                outputs, image_sizes, jnp.asarray(anchors), counts
            )
            if optimistic:
                det["dcn_escaped"] = (
                    jnp.any(jnp.stack(flags), axis=0)
                    if flags
                    else jnp.zeros((images.shape[0],), bool)
                )
            return det

        return shard_eval_fn(body, variables, mesh)


def build_backbone(cfg, dtype=jnp.float32):
    body = cfg.MODEL.BACKBONE.CONV_BODY
    out_channels = cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS
    if body == "MNV2-FPN-RETINANET":
        from .mobilenet import MobileNetV2

        return ResNetFPNBackbone(
            resnet=MobileNetV2(dtype=dtype),  # generic body slot
            out_channels=out_channels,
            skip_c2=True,
            use_p6p7=True,
            p6p7_from_c5=False,
            dtype=dtype,
        )
    resnet = resnet_from_cfg(cfg, dtype=dtype)
    if body.endswith("FPN-RETINANET"):
        return ResNetFPNBackbone(
            resnet=resnet,
            out_channels=out_channels,
            skip_c2=True,
            use_p6p7=True,
            p6p7_from_c5=cfg.MODEL.RETINANET.USE_C5,
            use_gn=cfg.MODEL.FPN.USE_GN,
            use_relu=cfg.MODEL.FPN.USE_RELU,
            dtype=dtype,
        )
    elif body.endswith("FPN"):
        return ResNetFPNBackbone(
            resnet=resnet,
            out_channels=out_channels,
            skip_c2=False,
            use_p6p7=False,
            use_gn=cfg.MODEL.FPN.USE_GN,
            use_relu=cfg.MODEL.FPN.USE_RELU,
            dtype=dtype,
        )
    raise NotImplementedError(f"CONV_BODY {body} not supported")


def build_detection_model(cfg, dtype=None) -> DetectionModel:
    if dtype is None:
        dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    from ..ops.nms import set_nms_impl
    from ..ops.dcn import set_default_dcn_mode

    set_nms_impl(cfg.TPU.NMS_IMPL)
    set_default_dcn_mode(cfg.TPU.DCN_MODE, cfg.TPU.DCN_WINDOW_MARGIN)
    dense = (
        cfg.MODEL.PAA_ON or cfg.MODEL.ATSS_ON or cfg.MODEL.FCOS_ON
        or cfg.MODEL.RETINANET_ON
    )
    if not dense and not cfg.MODEL.RPN_ONLY:
        # Faster/Mask/Keypoint R-CNN incl. single-level C4/FBNet bodies
        # (reference GeneralizedRCNN with ROI heads) — TwoStageModel
        # exposes the same engine protocol as DetectionModel
        from .two_stage import build_faster_rcnn

        return build_faster_rcnn(cfg, dtype=dtype)
    if not dense:
        # classic RPN-only proposal model (reference rpn_*.yaml, incl.
        # single-level C4 bodies): box-proposal AR instead of COCO AP
        from .two_stage import build_rpn_only

        return build_rpn_only(cfg, dtype=dtype)
    backbone = build_backbone(cfg, dtype=dtype)
    if cfg.MODEL.PAA_ON:
        head = paa_head_from_cfg(cfg, dtype=dtype)
        anchor_gen = make_anchor_generator_paa(cfg)
        strides = tuple(cfg.MODEL.PAA.ANCHOR_STRIDES)
        head_type = "paa"
    elif cfg.MODEL.ATSS_ON:
        from .atss_head import atss_head_from_cfg

        head = atss_head_from_cfg(cfg, dtype=dtype)
        anchor_gen = make_anchor_generator_atss(cfg)
        strides = tuple(cfg.MODEL.ATSS.ANCHOR_STRIDES)
        head_type = "atss"
    elif cfg.MODEL.FCOS_ON:
        from .anchors import LocationGenerator
        from .fcos_head import fcos_head_from_cfg

        head = fcos_head_from_cfg(cfg, dtype=dtype)
        anchor_gen = LocationGenerator(cfg.MODEL.FCOS.FPN_STRIDES)
        strides = tuple(cfg.MODEL.FCOS.FPN_STRIDES)
        head_type = "fcos"
    elif cfg.MODEL.RETINANET_ON:
        from .retinanet_head import retinanet_head_from_cfg

        head = retinanet_head_from_cfg(cfg, dtype=dtype)
        anchor_gen = make_anchor_generator_retinanet(cfg)
        strides = tuple(cfg.MODEL.RETINANET.ANCHOR_STRIDES)
        head_type = "retinanet"
    else:  # unreachable: dense is True in every branch above
        raise NotImplementedError("no head flag set")
    module = DenseDetector(backbone=backbone, head=head)
    return DetectionModel(
        cfg=cfg,
        module=module,
        anchor_generator=anchor_gen,
        box_coder=BoxCoder(cfg),
        strides=strides,
        head_type=head_type,
    )
