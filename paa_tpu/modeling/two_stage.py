"""Faster R-CNN two-stage assembly.

Re-designs the reference's GeneralizedRCNN two-stage path
(modeling/detector/generalized_rcnn.py + rpn + roi_heads/box_head):
R-50-FPN backbone (P2..P6 via LastLevelMaxPool), classic RPN over 5
levels (anchor sizes 32..512 at strides 4..64, 3 ratios), fixed-capacity
proposal selection, and the FPN2MLP box head pooling from P2..P5.

Everything is static-shape and jittable end-to-end: the RPN's NMS runs
as bounded pick-max scans, proposals are (B, K, 4) + masks, and the ROI
batch is a fixed 512 rois/image drawn by random-priority sampling.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .anchors import AnchorGenerator
from .fpn import ResNetFPNBackbone
from .resnet import resnet_from_cfg
from .roi_box_head import (
    FPN2MLPBoxHead,
    FPNXconvBoxHead,
    ROIBoxConfig,
    roi_box_loss,
    roi_box_postprocess_batched,
    subsample_proposals,
)
from .rpn import RPNConfig, RPNHead, rpn_loss, select_proposals


class FasterRCNN(nn.Module):
    """Also hosts the optional mask branch (Mask R-CNN when
    ``mask_head`` is set, cfg.MODEL.MASK_ON) and keypoint branch
    (Keypoint R-CNN when ``keypoint_head`` is set, KEYPOINT_ON)."""

    backbone: nn.Module
    rpn_head: nn.Module
    box_head: nn.Module
    mask_head: nn.Module = None
    keypoint_head: nn.Module = None
    # C4 Mask R-CNN: the mask branch consumes the BOX head's res5 ROI
    # features (reference roi_heads.py:19 shares the
    # ResNet50Conv5ROIFeatureExtractor); mask_head is then the
    # predictor-only MaskRCNNC4Predictor
    share_mask_extractor: bool = False

    def backbone_rpn(self, images):
        features = self.backbone(images)
        rpn_out = self.rpn_head(features)
        return features, rpn_out

    def box(self, features, rois, roi_batch_idx):
        # the pooler uses the first 4 pyramid levels (P2..P5)
        return self.box_head(list(features)[:4], rois, roi_batch_idx)

    def mask(self, features, rois, roi_batch_idx):
        if self.share_mask_extractor:
            _, _, res5 = self.box_head(
                list(features)[:4], rois, roi_batch_idx,
                return_features=True,
            )
            return self.mask_head(res5)
        return self.mask_head(list(features)[:4], rois, roi_batch_idx)

    def keypoint(self, features, rois, roi_batch_idx):
        return self.keypoint_head(
            list(features)[:4], rois, roi_batch_idx
        )

    def __call__(self, images, rois, roi_batch_idx):
        # exercises every branch so module.init creates all params
        features, rpn_out = self.backbone_rpn(images)
        cls_logits, box_deltas = self.box(features, rois, roi_batch_idx)
        out = (rpn_out, cls_logits, box_deltas)
        if self.mask_head is not None:
            out = out + (self.mask(features, rois, roi_batch_idx),)
        if self.keypoint_head is not None:
            out = out + (self.keypoint(features, rois, roi_batch_idx),)
        return out


@dataclass
class TwoStageModel:
    cfg: Any
    module: FasterRCNN
    anchor_generator: AnchorGenerator
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    head_type: str = "two_stage"

    def feature_shapes(self, image_hw):
        import math

        h, w = image_hw
        return [
            (int(math.ceil(h / s)), int(math.ceil(w / s)))
            for s in self.strides
        ]

    def anchors_for(self, image_hw):
        return self.anchor_generator(self.feature_shapes(image_hw))

    def init(self, rng, image_hw, batch_size=1):
        images = jnp.zeros((batch_size, *image_hw, 3), jnp.float32)
        rois = jnp.zeros((4, 4), jnp.float32)
        bidx = jnp.zeros((4,), jnp.int32)
        return self.module.init(rng, images, rois, bidx)

    # -- engine protocol (same surface as DetectionModel) ---------------

    @property
    def train_batch_keys(self):
        keys = ("images", "gt_boxes", "gt_labels", "image_sizes")
        if self.cfg.MODEL.MASK_ON:
            keys = keys + ("gt_masks",)
        if self.cfg.MODEL.KEYPOINT_ON:
            keys = keys + ("gt_keypoints",)
        return keys

    def make_bucket_train_step(self, hw, param_label_tree=None,
                               num_shards=1):
        """train_step(state, batch) -> (state, metrics) for one bucket.

        The ROI subsampling rng derives from state.step (fold_in), so
        resume reproduces the same sampling stream without threading
        keys through the trainer.
        """
        import optax

        from ..ops.image_norm import maybe_device_normalize

        loss_body = faster_rcnn_train_step_fns(self, hw, num_shards)
        base_rng = jax.random.PRNGKey(self.cfg.TPU.SEED)
        mask_on = self.cfg.MODEL.MASK_ON
        keypoint_on = self.cfg.MODEL.KEYPOINT_ON
        mean, std = self.cfg.INPUT.PIXEL_MEAN, self.cfg.INPUT.PIXEL_STD

        def loss_fn(params, batch, rng):
            if param_label_tree is not None:
                params = jax.tree_util.tree_map(
                    lambda p, label: (
                        jax.lax.stop_gradient(p) if label == "frozen" else p
                    ),
                    params,
                    param_label_tree,
                )
            losses = loss_body(
                {"params": params},
                maybe_device_normalize(
                    batch["images"], batch.get("image_sizes"), mean, std
                ),
                batch["gt_boxes"],
                batch["gt_labels"],
                batch["image_sizes"],
                rng,
                gt_masks=batch.get("gt_masks") if mask_on else None,
                gt_keypoints=(
                    batch.get("gt_keypoints") if keypoint_on else None
                ),
            )
            total = sum(
                v for k, v in losses.items() if k.startswith("loss_")
            )
            return total, losses

        def train_step(state, batch):
            rng = jax.random.fold_in(base_rng, state.step)
            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch, rng)
            updates, new_opt_state = state.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
            )
            metrics = dict(losses)
            metrics["loss"] = total
            return new_state, metrics

        return train_step

    def postprocess_config(self):
        return ROIBoxConfig.from_cfg(self.cfg)

    def make_eval_fn(self, variables, mesh=None):
        """eval_fn(images, image_sizes) -> detection dict; retraces per
        input shape (anchors are static per shape). With a multi-device
        ``mesh`` the batch shards over the data axis (shard_map)."""
        from ..ops.image_norm import maybe_device_normalize
        from ..utils.comm import shard_eval_fn

        mean, std = self.cfg.INPUT.PIXEL_MEAN, self.cfg.INPUT.PIXEL_STD

        def body(variables, images, image_sizes):
            images = maybe_device_normalize(
                images, image_sizes, mean, std
            )
            hw = images.shape[1:3]
            return faster_rcnn_eval_fn(self, hw)(
                variables, images, image_sizes
            )

        return shard_eval_fn(body, variables, mesh)


def build_faster_rcnn(cfg, dtype=jnp.float32) -> TwoStageModel:
    body = cfg.MODEL.BACKBONE.CONV_BODY
    if "FPN" not in body:
        return _build_single_level_rcnn(cfg, dtype)
    resnet = resnet_from_cfg(cfg, dtype=dtype)
    backbone = ResNetFPNBackbone(
        resnet=resnet,
        out_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
        skip_c2=False,
        use_p6p7=False,  # P6 via max-pool (LastLevelMaxPool)
        use_gn=cfg.MODEL.FPN.USE_GN,
        use_relu=cfg.MODEL.FPN.USE_RELU,
        dtype=dtype,
    )
    rpn_head = RPNHead(
        num_anchors=len(cfg.MODEL.RPN.ASPECT_RATIOS),
        in_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
        dtype=dtype,
    )
    bh = cfg.MODEL.ROI_BOX_HEAD
    extractor = bh.FEATURE_EXTRACTOR
    if extractor == "FPNXconv1fcFeatureExtractor":
        box_head = FPNXconvBoxHead(
            num_classes=bh.NUM_CLASSES,
            mlp_dim=bh.MLP_HEAD_DIM,
            conv_head_dim=bh.CONV_HEAD_DIM,
            num_stacked_convs=bh.NUM_STACKED_CONVS,
            dilation=bh.DILATION,
            resolution=bh.POOLER_RESOLUTION,
            sampling_ratio=max(bh.POOLER_SAMPLING_RATIO, 1),
            use_gn=bh.USE_GN,
            dtype=dtype,
        )
    else:
        box_head = FPN2MLPBoxHead(
            num_classes=bh.NUM_CLASSES,
            mlp_dim=bh.MLP_HEAD_DIM,
            resolution=bh.POOLER_RESOLUTION,
            sampling_ratio=max(bh.POOLER_SAMPLING_RATIO, 1),
            use_gn=bh.USE_GN,
            dtype=dtype,
        )
    anchor_gen = AnchorGenerator(
        sizes=cfg.MODEL.RPN.ANCHOR_SIZES,
        aspect_ratios=cfg.MODEL.RPN.ASPECT_RATIOS,
        strides=(4, 8, 16, 32, 64),
    )
    mask_head = None
    if cfg.MODEL.MASK_ON:
        from .roi_mask_head import MaskHead

        mh = cfg.MODEL.ROI_MASK_HEAD
        mask_scales = tuple(mh.POOLER_SCALES)
        if len(mask_scales) != 4:  # C4-style default: use the FPN levels
            mask_scales = (0.25, 0.125, 0.0625, 0.03125)
        mask_head = MaskHead(
            num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES - 1,
            conv_layers=tuple(mh.CONV_LAYERS),
            dilation=mh.DILATION,
            resolution=mh.POOLER_RESOLUTION,
            scales=mask_scales,
            sampling_ratio=max(mh.POOLER_SAMPLING_RATIO, 1),
            use_gn=mh.USE_GN,
            use_deconv=mh.PREDICTOR != "MaskRCNNConv1x1Predictor",
            dtype=dtype,
        )
    keypoint_head = None
    if cfg.MODEL.KEYPOINT_ON:
        from .roi_keypoint_head import KeypointHead

        kcfg = cfg.MODEL.ROI_KEYPOINT_HEAD
        scales = tuple(kcfg.POOLER_SCALES)
        if len(scales) != 4:  # C4-style single-scale config: use FPN
            scales = (0.25, 0.125, 0.0625, 0.03125)
        keypoint_head = KeypointHead(
            num_keypoints=kcfg.NUM_CLASSES,
            conv_channels=tuple(kcfg.CONV_LAYERS),
            resolution=kcfg.POOLER_RESOLUTION,
            scales=scales,
            sampling_ratio=max(kcfg.POOLER_SAMPLING_RATIO, 1),
            dtype=dtype,
        )
    module = FasterRCNN(
        backbone=backbone, rpn_head=rpn_head, box_head=box_head,
        mask_head=mask_head, keypoint_head=keypoint_head,
    )
    return TwoStageModel(
        cfg=cfg, module=module, anchor_generator=anchor_gen
    )


class _SingleLevelBackbone(nn.Module):
    """Wraps a body that returns multiple stages into a single-level
    feature list (the C4 path keeps only the last map)."""

    body: nn.Module

    def __call__(self, x):
        feats = self.body(x)
        return [feats[-1]] if isinstance(feats, (list, tuple)) else [feats]


def _build_single_level_rcnn(cfg, dtype=jnp.float32) -> TwoStageModel:
    """C4 (e.g. R-50-C4) and FBNet two-stage models: one stride-16
    feature map, a single-level RPN with all anchor sizes at that
    stride (reference make_anchor_generator for non-FPN RPN), and a
    res5 / FBNet-stage box head (reference
    roi_heads/box_head/roi_box_feature_extractors.py,
    backbone/fbnet.py FBNetROIHead)."""
    body = cfg.MODEL.BACKBONE.CONV_BODY
    num_anchors = (
        len(cfg.MODEL.RPN.ANCHOR_SIZES) * len(cfg.MODEL.RPN.ASPECT_RATIOS)
    )
    stride = cfg.MODEL.RPN.ANCHOR_STRIDE[0]

    if body == "FBNet":
        from .fbnet import (
            FBNetROIBoxHead,
            FBNetRPNHead,
            FBNetTrunk,
            fbnet_trunk_stride,
        )

        f = cfg.MODEL.FBNET
        assert fbnet_trunk_stride(f.ARCH) == stride, (
            f"FBNet trunk stride {fbnet_trunk_stride(f.ARCH)} != "
            f"RPN.ANCHOR_STRIDE {stride}"
        )
        backbone = _SingleLevelBackbone(
            body=FBNetTrunk(
                arch=f.ARCH, width_ratio=f.SCALE_FACTOR,
                width_divisor=f.WIDTH_DIVISOR, bn_type=f.BN_TYPE,
                dtype=dtype,
            )
        )
        rpn_head = FBNetRPNHead(
            arch=f.ARCH, num_anchors=num_anchors,
            width_ratio=f.SCALE_FACTOR, width_divisor=f.WIDTH_DIVISOR,
            bn_type=f.BN_TYPE, dtype=dtype,
        )
        box_head = FBNetROIBoxHead(
            arch=f.ARCH,
            num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
            resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            scale=1.0 / stride,
            width_ratio=f.SCALE_FACTOR, width_divisor=f.WIDTH_DIVISOR,
            bn_type=f.BN_TYPE, dtype=dtype,
        )
    else:
        from .roi_box_head import Res5ROIBoxHead

        assert body.endswith("-C4"), (
            f"single-level two-stage path supports C4 and FBNet bodies "
            f"(got {body})"
        )
        backbone = _SingleLevelBackbone(
            body=resnet_from_cfg(cfg, dtype=dtype)
        )
        rpn_head = RPNHead(
            num_anchors=num_anchors, in_channels=1024, dtype=dtype
        )
        box_head = Res5ROIBoxHead(
            num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
            resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
            if cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION >= 14 else 14,
            scale=1.0 / stride,
            num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
            width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
            dtype=dtype,
        )

    anchor_gen = AnchorGenerator(
        sizes=(tuple(cfg.MODEL.RPN.ANCHOR_SIZES),),  # ALL sizes, 1 level
        aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
        strides=(stride,),
    )
    assert not cfg.MODEL.KEYPOINT_ON, (
        "the keypoint branch is implemented for the FPN two-stage path"
    )
    mask_head = None
    share_mask = False
    if cfg.MODEL.MASK_ON:
        if body == "FBNet":
            from .fbnet import FBNetMaskHead

            mask_head = FBNetMaskHead(
                arch=f.ARCH,
                num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES - 1,
                resolution=cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
                scale=1.0 / stride,
                width_ratio=f.SCALE_FACTOR,
                width_divisor=f.WIDTH_DIVISOR,
                bn_type=f.BN_TYPE,
                use_deconv=(
                    cfg.MODEL.ROI_MASK_HEAD.PREDICTOR
                    != "MaskRCNNConv1x1Predictor"
                ),
                dtype=dtype,
            )
        elif cfg.MODEL.ROI_MASK_HEAD.SHARE_BOX_FEATURE_EXTRACTOR:
            # C4 mask, reference default: the box head's res5 extractor
            # IS the mask feature extractor (weights shared); the mask
            # head is the deconv predictor alone
            from .roi_mask_head import MaskRCNNC4Predictor

            share_mask = True
            mask_head = MaskRCNNC4Predictor(
                num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES - 1,
                dim_reduced=cfg.MODEL.ROI_MASK_HEAD.CONV_LAYERS[-1],
                dtype=dtype,
            )
        else:
            # unshared variant: independent conv-stack head on the
            # single stride-16 map
            from .roi_mask_head import MaskHead

            mask_head = MaskHead(
                num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES - 1,
                scales=(1.0 / stride,),
                dtype=dtype,
            )
    module = FasterRCNN(
        backbone=backbone, rpn_head=rpn_head, box_head=box_head,
        mask_head=mask_head,
        share_mask_extractor=share_mask,
    )
    return TwoStageModel(
        cfg=cfg, module=module, anchor_generator=anchor_gen,
        strides=(stride,),
    )


class RPNOnly(nn.Module):
    backbone: nn.Module
    rpn_head: nn.Module

    def __call__(self, images):
        return self.rpn_head(self.backbone(images))


@dataclass
class RPNOnlyModel:
    """RPN-only proposal model (reference rpn_*.yaml configs:
    GeneralizedRCNN with RPN_ONLY=True and no head flags). Evaluated by
    box-proposal average recall (evaluation/coco_eval.py
    evaluate_box_proposals), not COCO AP."""

    cfg: Any
    module: RPNOnly
    anchor_generator: AnchorGenerator
    strides: Tuple[int, ...]
    head_type: str = "rpn"

    def feature_shapes(self, image_hw):
        import math

        h, w = image_hw
        return [
            (int(math.ceil(h / s)), int(math.ceil(w / s)))
            for s in self.strides
        ]

    def anchors_for(self, image_hw):
        return self.anchor_generator(self.feature_shapes(image_hw))

    def init(self, rng, image_hw, batch_size=1):
        images = jnp.zeros((batch_size, *image_hw, 3), jnp.float32)
        return self.module.init(rng, images)

    @property
    def train_batch_keys(self):
        return ("images", "gt_boxes", "gt_labels", "image_sizes")

    def make_bucket_train_step(self, hw, param_label_tree=None,
                               num_shards=1):
        import optax

        from ..ops.image_norm import maybe_device_normalize

        anchors, counts = self.anchors_for(hw)
        anchors_j = jnp.asarray(anchors, jnp.float32)
        rc = RPNConfig.from_cfg(self.cfg, is_train=True)
        base_rng = jax.random.PRNGKey(self.cfg.TPU.SEED)
        mean, std = self.cfg.INPUT.PIXEL_MEAN, self.cfg.INPUT.PIXEL_STD

        def loss_fn(params, batch, rng):
            if param_label_tree is not None:
                params = jax.tree_util.tree_map(
                    lambda pp, label: (
                        jax.lax.stop_gradient(pp)
                        if label == "frozen" else pp
                    ),
                    params,
                    param_label_tree,
                )
            rpn_out = self.module.apply(
                {"params": params},
                maybe_device_normalize(
                    batch["images"], batch.get("image_sizes"), mean, std
                ),
            )
            losses = rpn_loss(
                rpn_out, batch["gt_boxes"], batch["gt_labels"],
                anchors_j, counts, rc, rng, num_shards,
                image_sizes=batch.get("image_sizes"),
            )
            total = sum(
                v for k, v in losses.items() if k.startswith("loss_")
            )
            return total, losses

        def train_step(state, batch):
            rng = jax.random.fold_in(base_rng, state.step)
            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch, rng)
            updates, new_opt_state = state.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=new_params,
                opt_state=new_opt_state,
            )
            metrics = dict(losses)
            metrics["loss"] = total
            return new_state, metrics

        return train_step

    def postprocess_config(self):
        return RPNConfig.from_cfg(self.cfg, is_train=False)

    def make_eval_fn(self, variables, mesh=None):
        rc = RPNConfig.from_cfg(self.cfg, is_train=False)
        from ..ops.image_norm import maybe_device_normalize
        from ..utils.comm import shard_eval_fn

        mean, std = self.cfg.INPUT.PIXEL_MEAN, self.cfg.INPUT.PIXEL_STD

        def body(variables, images, image_sizes):
            images = maybe_device_normalize(
                images, image_sizes, mean, std
            )
            hw = images.shape[1:3]
            anchors, counts = self.anchors_for(hw)
            rpn_out = self.module.apply(variables, images)
            boxes, scores, valid = select_proposals(
                rpn_out, image_sizes, jnp.asarray(anchors), counts, rc
            )
            return {
                "boxes": jnp.where(valid[..., None], boxes, 0.0),
                "scores": jnp.where(valid, scores, 0.0),
                "labels": valid.astype(jnp.int32),  # objectness class
                "valid": valid,
            }

        return shard_eval_fn(body, variables, mesh)


def build_rpn_only(cfg, dtype=jnp.float32) -> RPNOnlyModel:
    body = cfg.MODEL.BACKBONE.CONV_BODY
    if "FPN" in body:
        resnet = resnet_from_cfg(cfg, dtype=dtype)
        backbone = ResNetFPNBackbone(
            resnet=resnet,
            out_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
            skip_c2=False,
            use_p6p7=False,
            dtype=dtype,
        )
        strides = (4, 8, 16, 32, 64)
        sizes = tuple(cfg.MODEL.RPN.ANCHOR_SIZES)
        num_anchors = len(cfg.MODEL.RPN.ASPECT_RATIOS)
        in_ch = cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS
    else:
        assert body.endswith(("-C4", "-C5")), body
        backbone = _SingleLevelBackbone(
            body=resnet_from_cfg(cfg, dtype=dtype)
        )
        strides = (cfg.MODEL.RPN.ANCHOR_STRIDE[0],)
        sizes = (tuple(cfg.MODEL.RPN.ANCHOR_SIZES),)
        num_anchors = (
            len(cfg.MODEL.RPN.ANCHOR_SIZES)
            * len(cfg.MODEL.RPN.ASPECT_RATIOS)
        )
        in_ch = 1024
    module = RPNOnly(
        backbone=backbone,
        rpn_head=RPNHead(
            num_anchors=num_anchors, in_channels=in_ch, dtype=dtype
        ),
    )
    return RPNOnlyModel(
        cfg=cfg,
        module=module,
        anchor_generator=AnchorGenerator(
            sizes=sizes,
            aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
            strides=strides,
        ),
        strides=strides,
    )


def faster_rcnn_train_step_fns(model: TwoStageModel, image_hw,
                               num_shards=1):
    """Builds the jittable train loss for one bucket shape."""
    cfg = model.cfg
    anchors, counts = model.anchors_for(image_hw)
    anchors_j = jnp.asarray(anchors, jnp.float32)
    rc = RPNConfig.from_cfg(cfg, is_train=True)
    bc = ROIBoxConfig.from_cfg(cfg)

    mask_on = cfg.MODEL.MASK_ON
    keypoint_on = cfg.MODEL.KEYPOINT_ON

    def loss_fn(variables, images, gt_boxes, gt_labels, image_sizes, rng,
                gt_masks=None, gt_keypoints=None):
        features, rpn_out = model.module.apply(
            variables, images, method=FasterRCNN.backbone_rpn
        )
        losses = rpn_loss(
            rpn_out, gt_boxes, gt_labels, anchors_j, counts, rc,
            rng, num_shards, image_sizes=image_sizes,
        )
        proposals, p_scores, p_valid = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            select_proposals(
                rpn_out, image_sizes, anchors_j, counts, rc
            ),
        )
        bsz = images.shape[0]
        rngs = jax.random.split(jax.random.fold_in(rng, 1), bsz)
        (rois, roi_labels, reg_targets, roi_valid, roi_gt_idx,
         roi_gt_boxes) = jax.vmap(
            lambda p, v, gb, gl, r: subsample_proposals(
                p, v, gb, gl, bc, r
            )
        )(proposals, p_valid, gt_boxes, gt_labels, rngs)

        s = rois.shape[1]
        flat_rois = rois.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), s)
        cls_logits, box_deltas = model.module.apply(
            variables, features, flat_rois, batch_idx,
            method=FasterRCNN.box,
        )
        box_losses = roi_box_loss(
            cls_logits, box_deltas,
            roi_labels.reshape(-1), reg_targets.reshape(-1, 4),
            roi_valid.reshape(-1),
        )
        losses.update(box_losses)

        if mask_on and gt_masks is not None:
            from .roi_mask_head import crop_gt_masks_for_rois, mask_loss

            mask_logits = model.module.apply(
                variables, features, flat_rois, batch_idx,
                method=FasterRCNN.mask,
            )
            # matched gt mask per roi, cropped to the roi window
            roi_masks = jax.vmap(lambda gm, gi: gm[gi])(
                gt_masks.astype(jnp.float32), roi_gt_idx
            ).reshape(-1, *gt_masks.shape[-2:])
            targets = crop_gt_masks_for_rois(
                roi_masks, roi_gt_boxes.reshape(-1, 4), flat_rois,
                out_size=mask_logits.shape[1],
            )
            losses.update(
                mask_loss(
                    mask_logits, roi_labels.reshape(-1), targets,
                    roi_valid.reshape(-1),
                )
            )

        if keypoint_on and gt_keypoints is not None:
            from .roi_keypoint_head import keypoint_loss

            kp_logits = model.module.apply(
                variables, features, flat_rois, batch_idx,
                method=FasterRCNN.keypoint,
            )
            roi_kps = jax.vmap(lambda gk, gi: gk[gi])(
                gt_keypoints.astype(jnp.float32), roi_gt_idx
            ).reshape(-1, *gt_keypoints.shape[-2:])
            positive = (
                (roi_labels.reshape(-1) > 0) & roi_valid.reshape(-1)
            )
            losses.update(
                keypoint_loss(kp_logits, flat_rois, roi_kps, positive)
            )
        return losses

    return loss_fn


def faster_rcnn_eval_fn(model: TwoStageModel, image_hw):
    cfg = model.cfg
    anchors, counts = model.anchors_for(image_hw)
    anchors_j = jnp.asarray(anchors, jnp.float32)
    rc = RPNConfig.from_cfg(cfg, is_train=False)
    bc = ROIBoxConfig.from_cfg(cfg)

    def eval_fn(variables, images, image_sizes):
        features, rpn_out = model.module.apply(
            variables, images, method=FasterRCNN.backbone_rpn
        )
        proposals, p_scores, p_valid = select_proposals(
            rpn_out, image_sizes, anchors_j, counts, rc
        )
        bsz, k = proposals.shape[:2]
        flat_rois = proposals.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), k)
        cls_logits, box_deltas = model.module.apply(
            variables, features, flat_rois, batch_idx,
            method=FasterRCNN.box,
        )
        c = cls_logits.shape[-1]
        det = roi_box_postprocess_batched(
            cls_logits.reshape(bsz, k, c),
            box_deltas.reshape(bsz, k, c, 4),
            proposals,
            p_valid,
            image_sizes,
            bc,
        )

        if cfg.MODEL.MASK_ON:
            # Mask R-CNN eval: run the mask branch on the KEPT detection
            # boxes and emit the predicted class channel's probabilities
            # (reference roi_heads/mask_head/inference.py Masker input)
            d = det["boxes"].shape[1]
            det_rois = det["boxes"].reshape(-1, 4)
            det_bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), d)
            mask_logits = model.module.apply(
                variables, features, det_rois, det_bidx,
                method=FasterRCNN.mask,
            )  # (B*D, M, M, C-1)
            chan = jnp.maximum(det["labels"].reshape(-1) - 1, 0)
            sel = jnp.take_along_axis(
                mask_logits, chan[:, None, None, None], axis=-1
            )[..., 0]
            m = sel.shape[-1]
            det["masks"] = jax.nn.sigmoid(
                sel.astype(jnp.float32)
            ).reshape(bsz, d, m, m)

        if cfg.MODEL.KEYPOINT_ON:
            d = det["boxes"].shape[1]
            det_rois = det["boxes"].reshape(-1, 4)
            det_bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), d)
            kp_logits = model.module.apply(
                variables, features, det_rois, det_bidx,
                method=FasterRCNN.keypoint,
            )  # (B*D, S, S, K)
            s, k_ = kp_logits.shape[1], kp_logits.shape[3]
            det["kp_heatmaps"] = kp_logits.astype(jnp.float32).reshape(
                bsz, d, s, s, k_
            )
        return det

    return eval_fn
