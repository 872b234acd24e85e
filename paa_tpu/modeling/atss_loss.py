"""ATSS training loss, batched and on-device.

Re-designs reference paa_core/modeling/rpn/atss/loss.py:

- POSITIVE_TYPE='ATSS' (loss.py:131-186): per (GT, level) the TOPK
  anchors nearest by center distance are candidates; the IoU threshold is
  candidate-IoU mean + (Bessel-corrected) std per GT; positives must also
  have their anchor center inside the GT (margin 0.01); an anchor claimed
  by several GTs goes to the one with the highest IoU.
- POSITIVE_TYPE='IoU' (loss.py:188-224): plain matcher at FG/BG
  thresholds with low-quality matches, then centers-in-gt filtering of
  positives (failures become ignore).
- centerness targets sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b)))
  from the decoded GT vs the anchor center (loss.py:226-240).
- losses (loss.py:241-276): focal / num_pos_avg; centerness-weighted GIoU
  / sum_centerness_avg * REG_LOSS_WEIGHT; centerness BCE / num_pos_avg.

Candidate counts are FIXED (TOPK per level over all anchors), so unlike
PAA no per-candidate masking is needed — only invalid (padded) GTs are
masked out at the end.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.focal_loss import sigmoid_focal_loss
from ..structures.boxes import box_iou
from .box_coder import decode_box, encode_box
from .matcher import match_anchors
from .paa_loss import bce_with_logits, giou_loss

INF = 1e8


@dataclass(frozen=True)
class ATSSLossConfig:
    gamma: float = 2.0
    alpha: float = 0.25
    topk: int = 9
    fg_iou_threshold: float = 0.5
    bg_iou_threshold: float = 0.4
    reg_loss_weight: float = 2.0
    positive_type: str = "ATSS"
    use_iou_pred: bool = False
    iou_loss_weight: float = 0.5

    @staticmethod
    def from_cfg(cfg):
        return ATSSLossConfig(
            gamma=cfg.MODEL.ATSS.LOSS_GAMMA,
            alpha=cfg.MODEL.ATSS.LOSS_ALPHA,
            topk=cfg.MODEL.ATSS.TOPK,
            fg_iou_threshold=cfg.MODEL.ATSS.FG_IOU_THRESHOLD,
            bg_iou_threshold=cfg.MODEL.ATSS.BG_IOU_THRESHOLD,
            reg_loss_weight=cfg.MODEL.ATSS.REG_LOSS_WEIGHT,
            positive_type=cfg.MODEL.ATSS.POSITIVE_TYPE,
            use_iou_pred=cfg.MODEL.ATSS.USE_IOU_PRED,
            iou_loss_weight=cfg.MODEL.ATSS.IOU_LOSS_WEIGHT,
        )


def _anchor_centers(anchors):
    cx = (anchors[:, 2] + anchors[:, 0]) / 2.0
    cy = (anchors[:, 3] + anchors[:, 1]) / 2.0
    return cx, cy


def atss_assign(gt_boxes, gt_labels, anchors, level_counts, topk):
    """Vectorized ATSS positive assignment.

    Returns (labels (B, N) int32 with 0 bg, assigned_gt (B, N) int32).
    """
    bsz, num_gt = gt_labels.shape
    n = anchors.shape[0]
    gt_valid = gt_labels > 0

    iou = box_iou(anchors[None], gt_boxes)  # (B, N, G)

    acx, acy = _anchor_centers(anchors)
    gcx = (gt_boxes[..., 2] + gt_boxes[..., 0]) / 2.0  # (B, G)
    gcy = (gt_boxes[..., 3] + gt_boxes[..., 1]) / 2.0
    dist = jnp.sqrt(
        (acx[None, :, None] - gcx[:, None, :]) ** 2
        + (acy[None, :, None] - gcy[:, None, :]) ** 2
    )  # (B, N, G)

    # per-level topk nearest anchors per gt (k argmin passes — see
    # paa_loss.bottom_k_iterative for why not lax.top_k)
    from .paa_loss import bottom_k_iterative

    cand_chunks = []
    start = 0
    for count in level_counts:
        d = dist[:, start:start + count, :]  # (B, n_l, G)
        k = min(topk, count)
        _, idx = bottom_k_iterative(d.transpose(0, 2, 1), k)  # (B, G, k)
        cand_chunks.append(idx + start)
        start += count
    cand_idx = jnp.concatenate(cand_chunks, axis=-1)  # (B, G, K)

    # candidate IoUs and the mean+std threshold
    iou_t = iou.transpose(0, 2, 1)  # (B, G, N)
    cand_ious = jnp.take_along_axis(iou_t, cand_idx, axis=-1)  # (B, G, K)
    mean = cand_ious.mean(axis=-1, keepdims=True)
    k_total = cand_ious.shape[-1]
    std = jnp.sqrt(
        ((cand_ious - mean) ** 2).sum(axis=-1, keepdims=True)
        / max(k_total - 1, 1)
    )
    thresh = mean + std
    is_pos = cand_ious >= thresh  # (B, G, K)

    # candidate centers must lie inside the gt (margin 0.01)
    ccx = acx[cand_idx]  # (B, G, K)
    ccy = acy[cand_idx]
    l = ccx - gt_boxes[..., 0:1]
    t = ccy - gt_boxes[..., 1:2]
    r = gt_boxes[..., 2:3] - ccx
    b = gt_boxes[..., 3:4] - ccy
    in_gt = jnp.minimum(jnp.minimum(l, r), jnp.minimum(t, b)) > 0.01
    is_pos = is_pos & in_gt & gt_valid[:, :, None]

    # scatter candidate positivity into (B, G, N); conflicts resolved by
    # highest IoU over G
    gt_rows = jnp.arange(num_gt, dtype=jnp.int32)[:, None]

    def scatter_one(idx, val):
        return jnp.zeros((num_gt, n), dtype=bool).at[
            jnp.broadcast_to(gt_rows, idx.shape), idx
        ].max(val)

    pos_gn = jax.vmap(scatter_one)(cand_idx, is_pos)  # (B, G, N)
    ious_inf = jnp.where(pos_gn, iou_t, -INF)  # (B, G, N)
    best_val = ious_inf.max(axis=1)  # (B, N)
    assigned = ious_inf.argmax(axis=1).astype(jnp.int32)  # (B, N)
    labels = jnp.where(
        best_val > -INF / 2,
        jnp.take_along_axis(gt_labels, assigned, axis=1),
        0,
    ).astype(jnp.int32)
    return labels, assigned


SSC_OBJECT_SIZES = ((-1.0, 64.0), (64.0, 128.0), (128.0, 256.0),
                    (256.0, 512.0), (512.0, INF))


def ssc_assign(gt_boxes, gt_labels, anchors, level_counts):
    """POSITIVE_TYPE='SSC' (atss/loss.py:93-131): FCOS-style spatial and
    scale constraints evaluated at ANCHOR CENTERS — center inside the GT
    with margin 0.01, max l/t/r/b within the level's
    object-sizes-of-interest range, conflicts to the minimum-area GT."""
    import numpy as np

    gt_valid = gt_labels > 0
    acx, acy = _anchor_centers(anchors)

    l = acx[None, :, None] - gt_boxes[:, None, :, 0]  # (B, N, G)
    t = acy[None, :, None] - gt_boxes[:, None, :, 1]
    r = gt_boxes[:, None, :, 2] - acx[None, :, None]
    b = gt_boxes[:, None, :, 3] - acy[None, :, None]
    reg = jnp.stack([l, t, r, b], axis=-1)
    in_box = reg.min(axis=-1) > 0.01

    lo = np.concatenate([
        np.full(c, SSC_OBJECT_SIZES[i][0], dtype=np.float32)
        for i, c in enumerate(level_counts)
    ])
    hi = np.concatenate([
        np.full(c, SSC_OBJECT_SIZES[i][1], dtype=np.float32)
        for i, c in enumerate(level_counts)
    ])
    max_reg = reg.max(axis=-1)
    cared = (max_reg >= jnp.asarray(lo)[None, :, None]) & (
        max_reg <= jnp.asarray(hi)[None, :, None]
    )

    area = (gt_boxes[..., 2] - gt_boxes[..., 0] + 1.0) * (
        gt_boxes[..., 3] - gt_boxes[..., 1] + 1.0
    )
    loc_area = jnp.where(
        in_box & cared & gt_valid[:, None, :], area[:, None, :], INF
    )
    min_area = loc_area.min(axis=-1)
    assigned = loc_area.argmin(axis=-1).astype(jnp.int32)
    labels = jnp.where(
        min_area < INF,
        jnp.take_along_axis(gt_labels, assigned, axis=1),
        0,
    ).astype(jnp.int32)
    return labels, assigned


def iou_assign(gt_boxes, gt_labels, anchors, fg_thresh, bg_thresh):
    """RetinaNet-style assignment + centers-in-gt ignore filtering
    (loss.py:188-224)."""
    gt_valid = gt_labels > 0
    iou = box_iou(gt_boxes, anchors[None])  # (B, G, N)
    matched = match_anchors(
        iou, gt_valid, fg_thresh, bg_thresh,
        allow_low_quality_matches=True,
    )
    clamped = jnp.maximum(matched, 0)
    labels = jnp.where(
        matched >= 0,
        jnp.take_along_axis(gt_labels, clamped, axis=1),
        jnp.where(matched == -2, -1, 0),
    ).astype(jnp.int32)

    matched_boxes = jnp.take_along_axis(
        gt_boxes, clamped[:, :, None], axis=1
    )
    acx, acy = _anchor_centers(anchors)
    l = acx[None] - matched_boxes[..., 0]
    t = acy[None] - matched_boxes[..., 1]
    r = matched_boxes[..., 2] - acx[None]
    b = matched_boxes[..., 3] - acy[None]
    in_gt = jnp.minimum(jnp.minimum(l, r), jnp.minimum(t, b)) > 0.01
    labels = jnp.where((labels > 0) & ~in_gt, -1, labels)
    return labels, clamped


def compute_centerness_targets(reg_targets, anchors):
    """sqrt((min/max lr) * (min/max tb)) from decoded gts
    (loss.py:226-240)."""
    gts = decode_box(reg_targets, anchors)
    acx = (anchors[..., 2] + anchors[..., 0]) / 2.0
    acy = (anchors[..., 3] + anchors[..., 1]) / 2.0
    l = acx - gts[..., 0]
    t = acy - gts[..., 1]
    r = gts[..., 2] - acx
    b = gts[..., 3] - acy
    lr_min = jnp.minimum(l, r)
    lr_max = jnp.maximum(l, r)
    tb_min = jnp.minimum(t, b)
    tb_max = jnp.maximum(t, b)
    ratio = (lr_min / lr_max) * (tb_min / tb_max)
    return jnp.sqrt(jnp.clip(ratio, 0.0))


def atss_loss(outputs, gt_boxes, gt_labels, anchors, level_counts, lc,
              num_shards=1):
    cls_logits = outputs["cls_logits"].astype(jnp.float32)
    box_regression = outputs["box_regression"].astype(jnp.float32)
    # absent in the pure-RetinaNet ablation (USE_CENTERNESS_PRED and
    # USE_IOU_PRED both False, atss/ret_R_50_FPN_1.5x.yaml)
    centerness = outputs.get("iou_pred")
    if centerness is not None:
        centerness = centerness.astype(jnp.float32)
    anchors = jnp.asarray(anchors, jnp.float32)
    gt_boxes = gt_boxes.astype(jnp.float32)

    if lc.positive_type == "ATSS":
        labels, assigned = atss_assign(
            gt_boxes, gt_labels, anchors, level_counts, lc.topk
        )
    elif lc.positive_type == "IoU":
        labels, assigned = iou_assign(
            gt_boxes, gt_labels, anchors,
            lc.fg_iou_threshold, lc.bg_iou_threshold,
        )
    elif lc.positive_type == "SSC":
        labels, assigned = ssc_assign(
            gt_boxes, gt_labels, anchors, level_counts
        )
    else:
        raise NotImplementedError(lc.positive_type)

    matched_boxes = jnp.take_along_axis(
        gt_boxes, assigned[:, :, None], axis=1
    )
    reg_targets = encode_box(matched_boxes, anchors[None])

    pos = labels > 0
    posf = pos.astype(jnp.float32)
    num_pos = posf.sum()
    num_pos_norm = jnp.maximum(num_pos, float(num_shards))

    cls_loss = sigmoid_focal_loss(
        cls_logits, labels, lc.gamma, lc.alpha
    ).sum() / num_pos_norm

    if centerness is None:
        # no branch at all: unweighted GIoU normalized by num_pos —
        # RetinaNet-with-GIoU semantics, the stated intent of the
        # ablation config
        reg = giou_loss(box_regression, reg_targets, anchors[None])
        reg_loss = (reg * posf).sum() / num_pos_norm * lc.reg_loss_weight
        return {
            "loss_cls": cls_loss,
            "loss_reg": reg_loss,
            "num_pos": num_pos,
        }
    if lc.use_iou_pred:
        # RetinaNet/ATSS + IoU prediction ablation (the reference ships
        # atss/ret_iou_R_50_FPN_1.5x.yaml setting MODEL.ATSS.USE_IOU_PRED,
        # a key absent from its own defaults — PAA-paper semantics: the
        # branch predicts IoU(decoded box, matched GT), BCE'd against the
        # actual IoUs; GIoU is weighted by those IoUs (paa/loss.py:328-337)
        pred_boxes = decode_box(box_regression, anchors[None])
        iou_targets = jnp.where(
            pos,
            _pairwise_iou_aligned(pred_boxes, matched_boxes),
            0.0,
        )
        weight = jax.lax.stop_gradient(iou_targets)
        sum_w = jnp.maximum(weight.sum(), 1e-6)
        reg = giou_loss(box_regression, reg_targets, anchors[None])
        reg_loss = (reg * weight).sum() / sum_w * lc.reg_loss_weight
        branch_loss = (
            bce_with_logits(centerness, jax.lax.stop_gradient(iou_targets))
            * posf
        ).sum() / num_pos_norm * lc.iou_loss_weight
    else:
        ctr_targets = compute_centerness_targets(reg_targets, anchors[None])
        ctr_targets = jnp.where(pos, ctr_targets, 0.0)
        sum_ctr = jnp.maximum(ctr_targets.sum(), 1e-6)

        reg = giou_loss(box_regression, reg_targets, anchors[None])
        reg_loss = (reg * ctr_targets).sum() / sum_ctr * lc.reg_loss_weight

        branch_loss = (
            bce_with_logits(centerness, ctr_targets) * posf
        ).sum() / num_pos_norm

    return {
        "loss_cls": cls_loss,
        "loss_reg": reg_loss,
        "loss_centerness": branch_loss,
        "num_pos": num_pos,
    }


def _pairwise_iou_aligned(boxes_a, boxes_b):
    """Elementwise IoU of aligned (..., 4) boxes (+1 convention)."""
    ax1, ay1, ax2, ay2 = jnp.moveaxis(boxes_a, -1, 0)
    bx1, by1, bx2, by2 = jnp.moveaxis(boxes_b, -1, 0)
    iw = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1) + 1, 0.0)
    ih = jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1) + 1, 0.0)
    inter = iw * ih
    area_a = jnp.clip(ax2 - ax1 + 1, 0.0) * jnp.clip(ay2 - ay1 + 1, 0.0)
    area_b = jnp.clip(bx2 - bx1 + 1, 0.0) * jnp.clip(by2 - by1 + 1, 0.0)
    return inter / jnp.maximum(area_a + area_b - inter, 1e-6)
