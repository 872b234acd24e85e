"""Classic RPN (region proposal network), static-shape.

Re-designs reference paa_core/modeling/rpn/{rpn.py,loss.py,inference.py}:

- RPNHead (rpn.py:77-110): shared 3x3 conv + ReLU, 1x1 objectness (A)
  and 1x1 deltas (4A), normal(0.01)/bias-0 init;
- proposal selection (inference.py): per level, top PRE_NMS_TOP_N by
  objectness, decode with the (1,1,1,1) box coder, clip, NMS at
  NMS_THRESH keeping POST_NMS_TOP_N; across FPN levels concat and keep
  FPN_POST_NMS_TOP_N by score (per image — the reference's
  训练-time per-batch quirk is deliberately not replicated; per-image is
  the modern maskrcnn-benchmark default for test and what detectron2
  standardized on);
- loss (loss.py:92-131): matcher at 0.7/0.3 with low-quality matches,
  BalancedPositiveNegativeSampler (256/image, 50% positive), binary
  objectness cross-entropy + smooth-L1 on sampled positives.

All static shapes: proposals are fixed-capacity (K, 4) with validity
masks; the balanced sampler draws by random-priority masked top-k.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.nms import nms_auto as nms
from ..ops.nms import nms_batched_auto as nms_batched
from ..structures.boxes import box_iou, clip_to_image
from .box_coder import decode_box, encode_box
from .layers import conv, head_normal_init
from .matcher import match_anchors
from .retinanet_head import smooth_l1


class RPNHead(nn.Module):
    num_anchors: int = 3
    in_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        shared = conv(
            self.in_channels, 3, padding=1, use_bias=True,
            kernel_init=head_normal_init, dtype=self.dtype, name="conv",
        )
        cls_logits = conv(
            self.num_anchors, 1, use_bias=True,
            kernel_init=head_normal_init, dtype=self.dtype,
            name="cls_logits",
        )
        bbox_pred = conv(
            self.num_anchors * 4, 1, use_bias=True,
            kernel_init=head_normal_init, dtype=self.dtype,
            name="bbox_pred",
        )
        logits, reg = [], []
        for f in features:
            t = nn.relu(shared(f))
            b = f.shape[0]
            logits.append(cls_logits(t).reshape(b, -1))
            reg.append(bbox_pred(t).reshape(b, -1, 4))
        return {
            "objectness": jnp.concatenate(logits, axis=1),
            "box_regression": jnp.concatenate(reg, axis=1),
        }


@dataclass(frozen=True)
class RPNConfig:
    pre_nms_top_n: int = 1000
    post_nms_top_n: int = 1000
    fpn_post_nms_top_n: int = 1000
    nms_thresh: float = 0.7
    min_size: float = 0.0
    fg_iou_threshold: float = 0.7
    bg_iou_threshold: float = 0.3
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    straddle_thresh: float = 0.0

    @staticmethod
    def from_cfg(cfg, is_train=False):
        r = cfg.MODEL.RPN
        return RPNConfig(
            pre_nms_top_n=(
                r.PRE_NMS_TOP_N_TRAIN if is_train else r.PRE_NMS_TOP_N_TEST
            ),
            post_nms_top_n=(
                r.POST_NMS_TOP_N_TRAIN if is_train
                else r.POST_NMS_TOP_N_TEST
            ),
            fpn_post_nms_top_n=(
                r.FPN_POST_NMS_TOP_N_TRAIN if is_train
                else r.FPN_POST_NMS_TOP_N_TEST
            ),
            nms_thresh=r.NMS_THRESH,
            min_size=r.MIN_SIZE,
            fg_iou_threshold=r.FG_IOU_THRESHOLD,
            bg_iou_threshold=r.BG_IOU_THRESHOLD,
            batch_size_per_image=r.BATCH_SIZE_PER_IMAGE,
            positive_fraction=r.POSITIVE_FRACTION,
            straddle_thresh=float(r.STRADDLE_THRESH),
        )


def select_proposals(outputs, image_sizes, anchors, level_counts, rc):
    """Static-shape proposal selection, batched over images.

    Per level: batched top-k on objectness, decode, clip, then ONE
    batched NMS call for the whole batch (the Pallas lock-step kernel on
    TPU — see ops/nms_pallas.nms_pallas_batched). Returns (proposals
    (B, K, 4), scores (B, K), valid (B, K)) with K = fpn_post_nms_top_n.

    Gradients are stopped at the INPUTS: proposals are constants w.r.t.
    the RPN parameters (the reference computes them inside the no-grad
    RPN postprocessor, rpn/inference.py), and stopping here — not on the
    outputs — keeps reverse-mode autodiff from trying to linearize
    through the non-differentiable Pallas NMS kernel under jit.
    """
    obj = jax.lax.stop_gradient(outputs["objectness"])
    reg = jax.lax.stop_gradient(outputs["box_regression"])
    bsz = obj.shape[0]
    sizes = image_sizes.astype(jnp.float32)

    level_boxes, level_scores, level_valid = [], [], []
    start = 0
    for count in level_counts:
        sl = slice(start, start + count)
        o = obj[:, sl].astype(jnp.float32)  # (B, count)
        k = min(rc.pre_nms_top_n, count)
        top_o, idx = jax.lax.top_k(o, k)  # (B, k)
        reg_sel = jnp.take_along_axis(
            reg[:, sl].astype(jnp.float32), idx[..., None], axis=1
        )
        boxes = decode_box(
            reg_sel, anchors[sl][idx], weights=(1.0, 1.0, 1.0, 1.0)
        )  # (B, k, 4)
        boxes = clip_to_image(boxes, sizes)
        w = boxes[..., 2] - boxes[..., 0] + 1.0
        h = boxes[..., 3] - boxes[..., 1] + 1.0
        valid = (w >= rc.min_size) & (h >= rc.min_size)
        keep_n = min(rc.post_nms_top_n, k)
        kidx, kscores, kvalid = nms_batched(
            boxes, top_o, jnp.zeros((bsz, k), jnp.int32), valid,
            rc.nms_thresh, keep_n, class_aware=False,
        )
        level_boxes.append(
            jnp.take_along_axis(boxes, kidx[..., None], axis=1)
        )
        level_scores.append(kscores)
        level_valid.append(kvalid)
        start += count
    boxes = jnp.concatenate(level_boxes, axis=1)
    scores = jnp.concatenate(level_scores, axis=1)
    valid = jnp.concatenate(level_valid, axis=1)
    # FPN: keep the overall top fpn_post_nms_top_n by score
    k = min(rc.fpn_post_nms_top_n, scores.shape[1])
    masked = jnp.where(valid, scores, -jnp.inf)
    top_s, idx = jax.lax.top_k(masked, k)
    return (
        jnp.take_along_axis(boxes, idx[..., None], axis=1),
        top_s,
        jnp.isfinite(top_s),
    )


def balanced_sample(labels, rng, batch_size, positive_fraction):
    """BalancedPositiveNegativeSampler (modeling/
    balanced_positive_negative_sampler.py): random subset of positives
    (<= fraction*batch) + negatives filling the rest. Static-shape:
    random-priority top-k masks.

    labels: (N,) int; >0 pos, 0 neg, <0 ignore. Returns bool masks
    (pos_sel, neg_sel).
    """
    n = labels.shape[0]
    num_pos_cap = min(int(batch_size * positive_fraction), n)
    pos = labels > 0
    neg = labels == 0
    r1, r2 = jax.random.split(rng)
    pos_pri = jnp.where(pos, jax.random.uniform(r1, (n,)), -1.0)
    _, pos_idx = jax.lax.top_k(pos_pri, num_pos_cap)
    pos_sel = jnp.zeros(n, bool).at[pos_idx].set(True) & pos
    num_pos = pos_sel.sum()
    num_neg_target = batch_size - num_pos
    k_neg = min(batch_size, n)
    neg_pri = jnp.where(neg, jax.random.uniform(r2, (n,)), -1.0)
    _, neg_idx = jax.lax.top_k(neg_pri, k_neg)  # over-draw
    rank = jnp.zeros(n, jnp.int32).at[neg_idx].set(
        jnp.arange(k_neg, dtype=jnp.int32) + 1
    )
    neg_sel = (rank > 0) & (rank <= num_neg_target) & neg
    return pos_sel, neg_sel


def rpn_loss(outputs, gt_boxes, gt_labels, anchors, level_counts, rc,
             rng, num_shards=1, image_sizes=None):
    """RPNLossComputation (rpn/loss.py:92-131).

    image_sizes: optional (B, 2) float (height, width) of the TRUE
        per-image sizes. When given, anchors straddling the image
        boundary by more than rc.straddle_thresh are ignored (label -1),
        matching the reference's 'not_visibility' discard
        (rpn/loss.py:76-78, anchor_generator.py:97-110). Padded-grid
        anchors beyond a smaller image are thereby excluded from the
        objectness loss instead of being treated as negatives.
    """
    objectness = outputs["objectness"].astype(jnp.float32)
    box_regression = outputs["box_regression"].astype(jnp.float32)
    anchors = jnp.asarray(anchors, jnp.float32)
    gt_boxes = gt_boxes.astype(jnp.float32)
    gt_valid = gt_labels > 0

    iou = box_iou(gt_boxes, anchors[None])
    matched = match_anchors(
        iou, gt_valid, rc.fg_iou_threshold, rc.bg_iou_threshold,
        allow_low_quality_matches=True,
    )
    labels = jnp.where(
        matched >= 0, 1, jnp.where(matched == -2, -1, 0)
    ).astype(jnp.int32)
    if image_sizes is not None and rc.straddle_thresh >= 0:
        st = rc.straddle_thresh
        h = image_sizes[:, 0:1].astype(jnp.float32)
        w = image_sizes[:, 1:2].astype(jnp.float32)
        visible = (
            (anchors[None, :, 0] >= -st)
            & (anchors[None, :, 1] >= -st)
            & (anchors[None, :, 2] < w + st)
            & (anchors[None, :, 3] < h + st)
        )
        labels = jnp.where(visible, labels, -1)
    clamped = jnp.maximum(matched, 0)
    matched_boxes = jnp.take_along_axis(
        gt_boxes, clamped[:, :, None], axis=1
    )
    reg_targets = encode_box(
        matched_boxes, anchors[None], weights=(1.0, 1.0, 1.0, 1.0)
    )

    bsz = labels.shape[0]
    rngs = jax.random.split(rng, bsz)
    pos_sel, neg_sel = jax.vmap(
        lambda l, r: balanced_sample(
            l, r, rc.batch_size_per_image, rc.positive_fraction
        )
    )(labels, rngs)

    posf = pos_sel.astype(jnp.float32)
    self_sel = (pos_sel | neg_sel).astype(jnp.float32)
    n_sampled = jnp.maximum(self_sel.sum(), 1.0)

    reg = smooth_l1(box_regression, reg_targets, beta=1.0 / 9)
    loss_reg = (reg * posf[..., None]).sum() / n_sampled

    # binary cross entropy with logits over sampled anchors
    t = (labels > 0).astype(jnp.float32)
    bce = -(
        t * jax.nn.log_sigmoid(objectness)
        + (1 - t) * jax.nn.log_sigmoid(-objectness)
    )
    loss_obj = (bce * self_sel).sum() / n_sampled

    return {
        "loss_objectness": loss_obj,
        "loss_rpn_box_reg": loss_reg,
        "num_pos": posf.sum(),
    }
