"""ROI mask head (Mask R-CNN), static-shape.

Re-designs reference paa_core/modeling/roi_heads/mask_head/:

- MaskRCNNFPNFeatureExtractor: multilevel ROIAlign 14x14 + 4x(conv3x3
  256, ReLU);
- MaskRCNNC4Predictor: 2x2/2 transposed conv + ReLU + 1x1 conv to C-1
  per-class mask logits (28x28);
- loss (mask_head/loss.py): BCE on the matched class's mask channel
  over positive rois; targets are the GT polygons cropped to the roi and
  resized to 28x28 — here produced ON DEVICE by bilinear-cropping the
  box-normalized GT bitmasks (structures/masks.py) with the roi mapped
  into the matched GT box's frame, then thresholding at 0.5;
- inference: sigmoid mask of each detection's class, pasted into the
  image on host (structures/masks.paste_mask_in_image).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.roi_align import multilevel_roi_align, roi_align
from .layers import GroupNorm32, conv, kaiming_uniform_a1


class MaskHead(nn.Module):
    """MaskRCNNFPNFeatureExtractor (+GN/dilation variants) followed by
    MaskRCNNC4Predictor (deconv + 1x1) or MaskRCNNConv1x1Predictor
    (1x1 only; roi_mask_predictors.py:34-53)."""

    num_classes: int  # WITHOUT background
    conv_layers: tuple = (256, 256, 256, 256)
    dilation: int = 1
    resolution: int = 14
    scales: tuple = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 2
    use_gn: bool = False
    use_deconv: bool = True  # False = MaskRCNNConv1x1Predictor
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois, roi_batch_idx):
        if len(self.scales) == 1:  # single-level (C4 / FBNet) bodies
            x = roi_align(
                features[0], rois, roi_batch_idx,
                (self.resolution, self.resolution), self.scales[0],
                self.sampling_ratio,
            )
        else:
            x = multilevel_roi_align(
                features, rois, roi_batch_idx,
                (self.resolution, self.resolution), self.scales,
                self.sampling_ratio,
            )
        for i, channels in enumerate(self.conv_layers):
            x = conv(
                channels, 3, padding=self.dilation,
                dilation=self.dilation, use_bias=not self.use_gn,
                kernel_init=kaiming_uniform_a1, dtype=self.dtype,
                name=f"mask_fcn{i + 1}",
            )(x)
            if self.use_gn:
                x = GroupNorm32(channels, name=f"mask_fcn{i + 1}_gn")(x)
            x = nn.relu(x)
        if self.use_deconv:
            x = nn.ConvTranspose(
                self.conv_layers[-1], (2, 2), strides=(2, 2),
                kernel_init=kaiming_uniform_a1, name="conv5_mask",
            )(x)
            x = nn.relu(x)
        logits = conv(
            self.num_classes, 1, use_bias=True,
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name="mask_fcn_logits",
        )(x)
        return logits  # (R, 28, 28, C-1) (14x14 without the deconv)


class MaskRCNNC4Predictor(nn.Module):
    """The C4 mask predictor alone (roi_mask_predictors.py:10-31):
    ConvTranspose 2x2/2 to dim_reduced + ReLU + 1x1 conv to per-class
    mask logits, applied to the SHARED res5 ROI features produced by the
    box head's extractor (reference roi_heads.py:19 aliases the mask
    feature extractor to the box head's
    ResNet50Conv5ROIFeatureExtractor; FasterRCNN.mask reproduces the
    sharing by calling Res5ROIBoxHead with return_features=True).

    Channel convention: C-1 foreground classes (the reference emits
    NUM_CLASSES channels but its loss/inference index channels by label
    and never touch channel 0 — functionally identical; documented in
    PARITY.md)."""

    num_classes: int  # WITHOUT background
    dim_reduced: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Caffe2 MSRAFill == kaiming_normal fan_out
        # (roi_mask_predictors.py:22-27)
        kaiming_out = nn.initializers.variance_scaling(
            2.0, "fan_out", "normal")
        x = nn.ConvTranspose(
            self.dim_reduced, (2, 2), strides=(2, 2),
            kernel_init=kaiming_out, dtype=self.dtype, name="conv5_mask",
        )(x)
        x = nn.relu(x)
        return conv(
            self.num_classes, 1, use_bias=True,
            kernel_init=kaiming_out, dtype=self.dtype,
            name="mask_fcn_logits",
        )(x)  # (R, 14, 14, C-1)


def crop_gt_masks_for_rois(gt_masks, matched_gt_boxes, rois,
                           out_size=28):
    """On-device mask targets: bilinear-crop each roi's window out of the
    matched GT's box-normalized bitmask.

    gt_masks: (R, M, M) float (the matched GT's mask per roi);
    matched_gt_boxes: (R, 4); rois: (R, 4).
    Returns (R, out, out) float targets in [0, 1], thresholded at 0.5.
    """
    m = gt_masks.shape[-1]
    gx1 = matched_gt_boxes[:, 0]
    gy1 = matched_gt_boxes[:, 1]
    gw = jnp.maximum(matched_gt_boxes[:, 2] - gx1 + 1.0, 1.0)
    gh = jnp.maximum(matched_gt_boxes[:, 3] - gy1 + 1.0, 1.0)
    # roi mapped into the gt-box mask frame
    rx1 = (rois[:, 0] - gx1) / gw * m
    ry1 = (rois[:, 1] - gy1) / gh * m
    rx2 = (rois[:, 2] - gx1) / gw * m
    ry2 = (rois[:, 3] - gy1) / gh * m
    mask_rois = jnp.stack([rx1, ry1, rx2, ry2], axis=1)

    feats = gt_masks[:, :, :, None].astype(jnp.float32)  # (R, M, M, 1)

    def one(feat, roi):
        return roi_align(
            feat[None], roi[None], jnp.zeros((1,), jnp.int32),
            (out_size, out_size), 1.0, 2,
        )[0, :, :, 0]

    crops = jax.vmap(one)(feats, mask_rois)
    return (crops > 0.5).astype(jnp.float32)


def mask_loss(mask_logits, roi_labels, mask_targets, roi_valid):
    """BCE on the matched class channel over positive rois
    (mask_head/loss.py maskrcnn_loss)."""
    pos = (roi_labels > 0) & roi_valid
    posf = pos.astype(jnp.float32)
    n = jnp.maximum(posf.sum(), 1.0)
    cls_idx = jnp.maximum(roi_labels - 1, 0)  # channel = class - 1
    r = mask_logits.shape[0]
    logits = mask_logits[jnp.arange(r), :, :, cls_idx].astype(jnp.float32)
    t = mask_targets
    bce = -(
        t * jax.nn.log_sigmoid(logits)
        + (1 - t) * jax.nn.log_sigmoid(-logits)
    ).mean(axis=(1, 2))
    return {"loss_mask": (bce * posf).sum() / n}
