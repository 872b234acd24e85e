"""ROI keypoint head (Keypoint R-CNN), static-shape.

Re-designs reference paa_core/modeling/roi_heads/keypoint_head/:

- KeypointRCNNFeatureExtractor (roi_keypoint_feature_extractors.py):
  multilevel ROIAlign 14x14 over the FPN maps, then
  CONV_LAYERS=(512,)*8 3x3 convs + ReLU (kaiming-normal fan_out init);
- KeypointRCNNPredictor (roi_keypoint_predictors.py): ConvTranspose
  (kernel 4, stride 2, pad 1) to K=17 keypoint channels at 28x28,
  then bilinear x2 upsample (align_corners=False) to 56x56;
- loss (loss.py KeypointRCNNLossComputation.__call__): project each
  positive roi's matched GT keypoints into the 56x56 roi frame
  (structures/keypoints.keypoints_to_heatmap) and take softmax
  cross-entropy over the 3136 spatial bins, averaged over valid
  (visible + in-roi) keypoints;
- inference (inference.py heatmaps_to_keypoints): runs on host —
  structures/keypoints.heatmaps_to_keypoints; the device returns the
  raw per-detection heatmaps.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.roi_align import multilevel_roi_align
from ..structures.keypoints import keypoints_to_heatmap
from .layers import conv

kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal"
)


class KeypointHead(nn.Module):
    num_keypoints: int = 17
    conv_channels: tuple = (512,) * 8
    resolution: int = 14
    scales: tuple = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois, roi_batch_idx):
        x = multilevel_roi_align(
            features, rois, roi_batch_idx,
            (self.resolution, self.resolution), self.scales,
            self.sampling_ratio,
        )
        for i, ch in enumerate(self.conv_channels, 1):
            x = conv(
                ch, 3, padding=1, use_bias=True,
                kernel_init=kaiming_normal_fan_out, dtype=self.dtype,
                name=f"conv_fcn{i}",
            )(x)
            x = nn.relu(x)
        # deconv kernel 4 stride 2 pad 1: 14 -> 28. torch
        # ConvTranspose2d(k, s, p) corresponds to flax padding
        # (k - 1 - p) per side = (2, 2) here — verified value-exact
        # against the reference predictor in
        # tests/test_torch_import_roi.py (((1, 1), (1, 1)) would crop
        # the output to 26x26 and shift the heatmap geometry)
        x = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2),
            padding=((2, 2), (2, 2)),
            kernel_init=kaiming_normal_fan_out,
            name="kps_score_lowres",
        )(x.astype(jnp.float32))
        # bilinear x2 (torch interpolate align_corners=False) -> 56
        h, w = x.shape[1:3]
        x = jax.image.resize(
            x, (x.shape[0], h * 2, w * 2, x.shape[3]), method="bilinear"
        )
        return x  # (R, 56, 56, K) logits


def keypoint_loss(kp_logits, rois, roi_keypoints, roi_positive):
    """Softmax cross-entropy over heatmap bins (reference loss.py
    KeypointRCNNLossComputation.__call__:146-170).

    kp_logits: (R, S, S, K); rois: (R, 4); roi_keypoints: (R, K, 3)
    matched GT keypoints in image coords; roi_positive: (R,) bool.
    """
    r, s, _, k = kp_logits.shape
    lin, valid = keypoints_to_heatmap(roi_keypoints, rois, s)
    valid = valid * roi_positive[:, None].astype(valid.dtype)

    logits = kp_logits.astype(jnp.float32).reshape(r, s * s, k)
    logits = jnp.transpose(logits, (0, 2, 1)).reshape(r * k, s * s)
    targets = lin.reshape(r * k)
    validf = valid.reshape(r * k).astype(jnp.float32)

    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
    denom = jnp.maximum(validf.sum(), 1.0)
    return {"loss_kp": (ce * validf).sum() / denom}
