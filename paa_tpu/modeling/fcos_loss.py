"""FCOS training loss, batched and on-device.

Re-designs reference paa_core/modeling/rpn/fcos/loss.py:

- per-location l/t/r/b targets against every GT (loss.py:150-163);
- positivity: location inside the GT (or inside the center-sampling
  region when CENTER_SAMPLING_RADIUS > 0, loss.py:54-103) AND max target
  within the level's object-size-of-interest range ([-1,64],[64,128],...,
  [512,INF], loss.py:105-111);
- conflicts resolved by minimum GT area (loss.py:184-189);
- IOULoss ('iou' | 'linear_iou' | 'giou', layers/iou_loss.py:7-52)
  weighted by centerness targets / sum-centerness; focal cls / num_pos;
  centerness BCE / num_pos (loss.py:241-282);
- NORM_REG_TARGETS divides targets by the level stride (loss.py:141-144).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.focal_loss import sigmoid_focal_loss
from .paa_loss import bce_with_logits

INF = 1e8

OBJECT_SIZES = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))


@dataclass(frozen=True)
class FCOSLossConfig:
    gamma: float = 2.0
    alpha: float = 0.25
    strides: tuple = (8, 16, 32, 64, 128)
    center_sampling_radius: float = 0.0
    iou_loss_type: str = "iou"
    norm_reg_targets: bool = False

    @staticmethod
    def from_cfg(cfg):
        return FCOSLossConfig(
            gamma=cfg.MODEL.FCOS.LOSS_GAMMA,
            alpha=cfg.MODEL.FCOS.LOSS_ALPHA,
            strides=tuple(cfg.MODEL.FCOS.FPN_STRIDES),
            center_sampling_radius=cfg.MODEL.FCOS.CENTER_SAMPLING_RADIUS,
            iou_loss_type=cfg.MODEL.FCOS.IOU_LOSS_TYPE,
            norm_reg_targets=cfg.MODEL.FCOS.NORM_REG_TARGETS,
        )


def iou_loss_ltrb(pred, target, loss_type="iou"):
    """IOULoss on l/t/r/b distances (layers/iou_loss.py:12-45)."""
    tl, tt, tr, tb = (target[..., i] for i in range(4))
    pl, pt, pr, pb = (pred[..., i] for i in range(4))
    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl + pr) * (pt + pb)
    w_inter = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    g_w = jnp.maximum(pl, tl) + jnp.maximum(pr, tr)
    h_inter = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    g_h = jnp.maximum(pb, tb) + jnp.maximum(pt, tt)
    ac_union = g_w * g_h + 1e-7
    area_inter = w_inter * h_inter
    area_union = target_area + pred_area - area_inter
    ious = (area_inter + 1.0) / (area_union + 1.0)
    gious = ious - (ac_union - area_union) / ac_union
    if loss_type == "iou":
        return -jnp.log(ious)
    elif loss_type == "linear_iou":
        return 1 - ious
    elif loss_type == "giou":
        return 1 - gious
    raise NotImplementedError(loss_type)


def fcos_assign(gt_boxes, gt_labels, locations, level_counts, lc):
    """Vectorized FCOS target assignment.

    locations: (N, 2). Returns labels (B, N), reg_targets (B, N, 4)
    un-normalized l/t/r/b.
    """
    gt_valid = gt_labels > 0
    xs = locations[:, 0]  # (N,)
    ys = locations[:, 1]

    l = xs[None, :, None] - gt_boxes[:, None, :, 0]  # (B, N, G)
    t = ys[None, :, None] - gt_boxes[:, None, :, 1]
    r = gt_boxes[:, None, :, 2] - xs[None, :, None]
    b = gt_boxes[:, None, :, 3] - ys[None, :, None]
    reg = jnp.stack([l, t, r, b], axis=-1)  # (B, N, G, 4)

    if lc.center_sampling_radius > 0:
        cx = (gt_boxes[..., 0] + gt_boxes[..., 2]) / 2  # (B, G)
        cy = (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2
        # per-level stride radius
        stride_per_loc = np.concatenate(
            [
                np.full(c, s, dtype=np.float32)
                for c, s in zip(level_counts, lc.strides)
            ]
        )
        rad = (
            jnp.asarray(stride_per_loc)[None, :, None]
            * lc.center_sampling_radius
        )
        x0 = jnp.maximum(cx[:, None, :] - rad, gt_boxes[:, None, :, 0])
        y0 = jnp.maximum(cy[:, None, :] - rad, gt_boxes[:, None, :, 1])
        x1 = jnp.minimum(cx[:, None, :] + rad, gt_boxes[:, None, :, 2])
        y1 = jnp.minimum(cy[:, None, :] + rad, gt_boxes[:, None, :, 3])
        in_box = (
            (xs[None, :, None] - x0 > 0)
            & (ys[None, :, None] - y0 > 0)
            & (x1 - xs[None, :, None] > 0)
            & (y1 - ys[None, :, None] > 0)
        )
    else:
        in_box = reg.min(axis=-1) > 0

    size_lo = np.concatenate(
        [
            np.full(c, OBJECT_SIZES[i][0], dtype=np.float32)
            for i, c in enumerate(level_counts)
        ]
    )
    size_hi = np.concatenate(
        [
            np.full(c, OBJECT_SIZES[i][1], dtype=np.float32)
            for i, c in enumerate(level_counts)
        ]
    )
    max_reg = reg.max(axis=-1)  # (B, N, G)
    cared = (max_reg >= jnp.asarray(size_lo)[None, :, None]) & (
        max_reg <= jnp.asarray(size_hi)[None, :, None]
    )

    # area WITHOUT the +1 convention? BoxList.area uses +1 — keep parity.
    area = (gt_boxes[..., 2] - gt_boxes[..., 0] + 1.0) * (
        gt_boxes[..., 3] - gt_boxes[..., 1] + 1.0
    )  # (B, G)
    loc_area = jnp.where(
        in_box & cared & gt_valid[:, None, :],
        area[:, None, :],
        INF,
    )
    min_area = loc_area.min(axis=-1)  # (B, N)
    gt_idx = loc_area.argmin(axis=-1).astype(jnp.int32)

    labels = jnp.where(
        min_area < INF,
        jnp.take_along_axis(gt_labels, gt_idx, axis=1),
        0,
    ).astype(jnp.int32)
    reg_targets = jnp.take_along_axis(
        reg, gt_idx[:, :, None, None].repeat(4, axis=-1), axis=2
    )[:, :, 0]
    return labels, reg_targets


def compute_centerness_targets_ltrb(reg_targets):
    lr = reg_targets[..., 0::2]
    tb = reg_targets[..., 1::2]
    c = (lr.min(-1) / lr.max(-1)) * (tb.min(-1) / tb.max(-1))
    return jnp.sqrt(jnp.clip(c, 0.0))


def fcos_loss(outputs, gt_boxes, gt_labels, locations, level_counts, lc,
              num_shards=1):
    """``locations`` here is the (N, 4) (x, y, x, y) tiling used by the
    shared engine plumbing (the first two columns are the point)."""
    cls_logits = outputs["cls_logits"].astype(jnp.float32)
    box_regression = outputs["box_regression"].astype(jnp.float32)
    centerness = outputs["iou_pred"].astype(jnp.float32)
    locations = jnp.asarray(locations, jnp.float32)[:, :2]
    gt_boxes = gt_boxes.astype(jnp.float32)

    labels, reg_targets = fcos_assign(
        gt_boxes, gt_labels, locations, level_counts, lc
    )
    if lc.norm_reg_targets:
        stride_per_loc = np.concatenate(
            [
                np.full(c, s, dtype=np.float32)
                for c, s in zip(level_counts, lc.strides)
            ]
        )
        reg_targets = reg_targets / jnp.asarray(stride_per_loc)[None, :, None]

    pos = labels > 0
    posf = pos.astype(jnp.float32)
    num_pos = posf.sum()
    num_pos_norm = jnp.maximum(num_pos, float(num_shards))

    cls_loss = sigmoid_focal_loss(
        cls_logits, labels, lc.gamma, lc.alpha
    ).sum() / num_pos_norm

    ctr_targets = jnp.where(
        pos, compute_centerness_targets_ltrb(reg_targets), 0.0
    )
    sum_ctr = jnp.maximum(ctr_targets.sum(), 1e-6)

    # guard the log/divides on bg rows (targets there can be negative)
    safe_targets = jnp.where(pos[..., None], reg_targets, 1.0)
    safe_preds = jnp.where(pos[..., None], box_regression, 1.0)
    reg = iou_loss_ltrb(safe_preds, safe_targets, lc.iou_loss_type)
    reg_loss = (reg * ctr_targets).sum() / sum_ctr

    ctr_loss = (
        bce_with_logits(centerness, ctr_targets) * posf
    ).sum() / num_pos_norm

    return {
        "loss_cls": cls_loss,
        "loss_reg": reg_loss,
        "loss_centerness": ctr_loss,
        "num_pos": num_pos,
    }
