"""PAA post-processing: static-shape, fully on-device.

Re-designs reference paa_core/modeling/rpn/paa/inference.py as pure batched
functions:

- per level (inference.py:36-82): sigmoid scores, candidate mask at
  INFERENCE_TH applied to the RAW cls scores, score fusion
  ``sqrt(cls * iou_pred)``, per-image top-k (PRE_NMS_TOP_N) among
  candidates via masked ``lax.top_k``, decode, clip;
- across levels (inference.py:105-121): class-aware greedy NMS at NMS_TH
  emitting exactly DETECTIONS_PER_IMG picks (greedy NMS selects in
  descending score order, so this equals full ml_nms + kthvalue cap);
- optional score voting (inference.py:123-157): for every kept detection,
  an exp(-(1-IoU)^2/sigma)-weighted average over all same-class pre-NMS
  candidates with IoU > 0.01.

Everything is (B, ...) batched with validity masks instead of the
reference's per-image BoxList loops.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.nms import nms_auto as nms
from ..ops.nms import nms_batched_auto as nms_batched
from ..structures.boxes import box_iou, clip_to_image
from .box_coder import decode_box

_SCORE_VOTING_SIGMA = 0.025  # reference inference.py:128
_IOU_VOTE_MIN = 0.01  # reference inference.py:141


def _logit(th):
    """sigmoid(x) > th  <=>  x.astype(f32) > logit(th): the compare
    runs on f32-upcast logits against an f32 threshold (no full-tensor
    f32 sigmoid — the convert fuses into the compare). Comparing in raw
    bf16 would round logit(0.05)=-2.9444 to -2.9375 and drop borderline
    candidates with score in (0.0500, 0.0503] relative to the
    reference's f32 sigmoid comparison (advisor r2 finding)."""
    import math

    return jnp.float32(math.log(th) - math.log1p(-th))


@dataclass(frozen=True)
class PostProcessConfig:
    pre_nms_thresh: float = 0.05
    pre_nms_top_n: int = 1000
    nms_thresh: float = 0.6
    detections_per_img: int = 100
    num_classes: int = 80  # WITHOUT background
    score_voting: bool = True

    @staticmethod
    def from_cfg(cfg):
        return PostProcessConfig(
            pre_nms_thresh=cfg.MODEL.PAA.INFERENCE_TH,
            pre_nms_top_n=cfg.MODEL.PAA.PRE_NMS_TOP_N,
            nms_thresh=cfg.MODEL.PAA.NMS_TH,
            detections_per_img=cfg.TEST.DETECTIONS_PER_IMG,
            num_classes=cfg.MODEL.PAA.NUM_CLASSES - 1,
            score_voting=cfg.MODEL.PAA.INFERENCE_SCORE_VOTING,
        )


def _select_level(cls_logits, box_regression, iou_pred, anchors, pp,
                  decode_fn=None, reg_scale=1.0):
    """Single-level candidate selection for one image.

    cls_logits: (N, C); box_regression: (N, 4); iou_pred: (N,) or None;
    anchors: (N, 4). Returns (boxes (K,4), scores (K,), labels (K,),
    valid (K,)) with K = min(pre_nms_top_n, N*C).

    ``decode_fn(reg, anchors)`` overrides the box decode (FCOS l/t/r/b);
    ``reg_scale`` multiplies regression outputs before decoding (FCOS
    NORM_REG_TARGETS stride scaling done in the torch head at eval).
    """
    n, c = cls_logits.shape
    cls_prob = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    # threshold on RAW cls scores, compared in f32 logit space (sigmoid
    # is monotone; the upcast fuses into the compare — same rule as the
    # batched path)
    cand = cls_logits.astype(jnp.float32) > _logit(pp.pre_nms_thresh)
    if iou_pred is not None:
        iou_prob = jax.nn.sigmoid(iou_pred.astype(jnp.float32))
        fused = jnp.sqrt(cls_prob * iou_prob[:, None])
    else:
        fused = cls_prob

    k = min(pp.pre_nms_top_n, n * c)
    masked = jnp.where(cand, fused, -1.0).reshape(-1)
    scores, flat_idx = jax.lax.top_k(masked, k)
    anchor_idx = flat_idx // c
    labels = (flat_idx % c + 1).astype(jnp.int32)
    valid = scores > 0.0  # only true candidates survive

    decode = decode_fn or decode_box
    boxes = decode(
        box_regression[anchor_idx].astype(jnp.float32) * reg_scale,
        anchors[anchor_idx],
    )
    return boxes, scores, labels, valid


def _score_vote(kept_boxes, kept_labels, kept_valid,
                cand_boxes, cand_scores, cand_labels, cand_valid):
    """Score voting for one image (inference.py:123-157)."""
    ious = box_iou(kept_boxes, cand_boxes)  # (D, K) +1 convention
    same_label = kept_labels[:, None] == cand_labels[None, :]
    pos = (ious > _IOU_VOTE_MIN) & same_label & cand_valid[None, :]
    pis = jnp.where(
        pos,
        jnp.exp(-((1.0 - ious) ** 2) / _SCORE_VOTING_SIGMA)
        * cand_scores[None, :],
        0.0,
    )
    denom = pis.sum(axis=1, keepdims=True)
    voted = (pis[:, :, None] * cand_boxes[None, :, :]).sum(axis=1) / jnp.maximum(
        denom, 1e-12
    )
    use_vote = (denom[:, 0] > 0) & kept_valid
    return jnp.where(use_vote[:, None], voted, kept_boxes)


def _postprocess_single(cls_logits, box_regression, iou_pred, image_size,
                        anchors, level_counts, pp, decode_fn=None,
                        reg_scales=None):
    """Full post-processing for ONE image. Level-split is static."""
    boxes_l, scores_l, labels_l, valid_l = [], [], [], []
    start = 0
    for li, count in enumerate(level_counts):
        sl = slice(start, start + count)
        b, s, l, v = _select_level(
            cls_logits[sl],
            box_regression[sl],
            None if iou_pred is None else iou_pred[sl],
            anchors[sl],
            pp,
            decode_fn=decode_fn,
            reg_scale=1.0 if reg_scales is None else reg_scales[li],
        )
        boxes_l.append(b)
        scores_l.append(s)
        labels_l.append(l)
        valid_l.append(v)
        start += count

    boxes = jnp.concatenate(boxes_l, axis=0)
    scores = jnp.concatenate(scores_l, axis=0)
    labels = jnp.concatenate(labels_l, axis=0)
    valid = jnp.concatenate(valid_l, axis=0)

    # clip to the (un-padded) image extent, like BoxList.clip_to_image
    boxes = clip_to_image(boxes, image_size.astype(boxes.dtype))

    keep_idx, keep_scores, keep_valid = nms(
        boxes, scores, labels, valid, pp.nms_thresh,
        pp.detections_per_img, class_aware=True,
    )
    kept_boxes = boxes[keep_idx]
    kept_labels = labels[keep_idx]

    if pp.score_voting:
        kept_boxes = _score_vote(
            kept_boxes, kept_labels, keep_valid,
            boxes, scores, labels, valid,
        )

    return {
        "boxes": jnp.where(keep_valid[:, None], kept_boxes, 0.0),
        "scores": jnp.where(keep_valid, keep_scores, 0.0),
        "labels": jnp.where(keep_valid, kept_labels, 0),
        "valid": keep_valid,
    }


def _select_level_batched(cls_logits, box_regression, iou_pred, anchors,
                          pp, decode_fn=None, reg_scale=1.0):
    """Single-level candidate selection for the WHOLE batch.

    Same semantics as vmap(_select_level) but with a fast path: when no
    image in the batch has more than ``pre_nms_top_n`` thresholded
    candidates (the common case at eval — most anchors are background),
    the top-k is replaced by a cumsum compaction (the top-k of <=k
    candidates is just "all of them"; greedy NMS and score voting are
    order-independent, so emitting candidates in index order instead of
    score order yields identical detections). Exact ``lax.top_k`` is the
    cond fallback when any image exceeds k. Measured on TPU v5e at
    800x1344 batch 8: top_k(1000) over the flattened level scores costs
    15.1 ms across levels; the compaction path ~1 ms.

    cls_logits: (B, n, C); box_regression: (B, n, 4); iou_pred: (B, n)
    or None; anchors: (n, 4). Returns (boxes (B, K, 4), scores (B, K),
    labels (B, K), valid (B, K)) with K = min(pre_nms_top_n, n*C).
    """
    bsz, n, c = cls_logits.shape
    m_flat = n * c
    k = min(pp.pre_nms_top_n, m_flat)
    decode = decode_fn or decode_box
    # candidate mask off the f32-upcast logits (logit-space threshold)
    # — no f32 sigmoid over the full (B, N*C) tensor
    cand = (
        cls_logits.astype(jnp.float32) > _logit(pp.pre_nms_thresh)
    ).reshape(bsz, m_flat)

    # two-level candidate indexing: per-block counts + tiny prefix; the
    # j-th candidate is found by one broadcast compare over the block
    # prefix and one scan over a single gathered S-wide block row. This
    # replaces a flat 1.3M-element top_k (15 ms at 800x1344 B=8) and a
    # flat-cumsum + searchsorted (~10 ms) with ~1-3 ms of work.
    S = 512
    pad = (-m_flat) % S
    blocks = jnp.pad(cand, ((0, 0), (0, pad))).reshape(bsz, -1, S)
    g = blocks.shape[1]
    bcount = blocks.sum(axis=2, dtype=jnp.int32)
    bprefix = jnp.cumsum(bcount, axis=1)  # (B, G) inclusive
    total = bprefix[:, -1]
    max_cand = total.max()

    def _finish(score, flat_idx, kk):
        """Per-candidate gathers + decode at tier width kk, padded to
        the static k slots (padding scores -1 => invalid)."""
        anchor_idx = flat_idx // c
        labels = (flat_idx % c + 1).astype(jnp.int32)
        reg_sel = jnp.take_along_axis(
            box_regression.astype(jnp.float32),
            anchor_idx[..., None], axis=1,
        )
        boxes = decode(reg_sel * reg_scale, anchors[anchor_idx])
        if kk < k:
            boxes = jnp.pad(boxes, ((0, 0), (0, k - kk), (0, 0)))
            score = jnp.pad(
                score, ((0, 0), (0, k - kk)), constant_values=-1.0
            )
            labels = jnp.pad(labels, ((0, 0), (0, k - kk)))
        return boxes, score, labels

    def topk_path(_):
        cls_prob = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        if iou_pred is None:
            fused = cls_prob
        else:
            fused = jnp.sqrt(
                cls_prob
                * jax.nn.sigmoid(iou_pred.astype(jnp.float32))[..., None]
            )
        masked = jnp.where(
            cand.reshape(bsz, n, c), fused, -1.0
        ).reshape(bsz, m_flat)
        s, i = jax.lax.top_k(masked, k)
        return _finish(s, i.astype(jnp.int32), k)

    def compact_path(kk):
        """Emit the first kk candidates in index order (greedy NMS and
        score voting are order-independent, so index order == score
        order in results). Work per slot is O(G) + O(S), so the small
        tier (kk=128, the common sparse case at eval) is ~8x cheaper
        than the full kk=k tier."""

        def fn(_):
            targets = jnp.arange(1, kk + 1, dtype=jnp.int32)
            # block of the j-th candidate: #blocks with prefix < j
            bidx = (
                bprefix[:, None, :] < targets[None, :, None]
            ).sum(axis=2, dtype=jnp.int32)  # (B, kk)
            bidx_c = jnp.minimum(bidx, g - 1)
            base = jnp.where(
                bidx_c > 0,
                jnp.take_along_axis(
                    bprefix, jnp.maximum(bidx_c - 1, 0), axis=1
                ),
                0,
            )
            local_t = targets[None, :] - base  # 1-based rank in block
            rows = jnp.take_along_axis(
                blocks.astype(jnp.int32), bidx_c[..., None], axis=1
            )  # (B, kk, S)
            within = (
                jnp.cumsum(rows, axis=2) < local_t[..., None]
            ).sum(axis=2, dtype=jnp.int32)
            flat_idx = jnp.minimum(bidx_c * S + within, m_flat - 1)
            slot_valid = targets[None, :] <= total[:, None]

            # scores only for the kk selected candidates
            sel_cls = jnp.take_along_axis(
                cls_logits.reshape(bsz, m_flat), flat_idx, axis=1
            ).astype(jnp.float32)
            score = jax.nn.sigmoid(sel_cls)
            if iou_pred is not None:
                sel_iou = jnp.take_along_axis(
                    iou_pred, flat_idx // c, axis=1
                ).astype(jnp.float32)
                score = jnp.sqrt(score * jax.nn.sigmoid(sel_iou))
            return _finish(
                jnp.where(slot_valid, score, -1.0), flat_idx, kk
            )

        return fn

    small = min(128, k)
    if small < k:
        fallback = lambda op: jax.lax.cond(  # noqa: E731
            max_cand <= k, compact_path(k), topk_path, op
        )
        boxes, scores, labels = jax.lax.cond(
            max_cand <= small, compact_path(small), fallback, 0
        )
    else:
        boxes, scores, labels = jax.lax.cond(
            max_cand <= k, compact_path(k), topk_path, 0
        )
    return boxes, scores, labels, scores > 0.0


def paa_postprocess(outputs, image_sizes, anchors, level_counts, pp,
                    decode_fn=None, reg_scales=None):
    """Batched post-processing.

    Args:
        outputs: dict with 'cls_logits' (B, N, C), 'box_regression'
            (B, N, 4), optional 'iou_pred' (B, N).
        image_sizes: (B, 2) float (h, w) un-padded content extents.
        anchors: (N, 4) float32 (shared across the batch).
        level_counts: static per-level anchor counts summing to N.
        pp: PostProcessConfig.

    Returns dict of (B, detections_per_img, ...) arrays. Equivalent to
    vmap(_postprocess_single) — asserted by
    tests/test_paa_inference.py — but with batched per-level selection
    (see _select_level_batched) so only NMS + score voting run under
    vmap.
    """
    iou_pred = outputs.get("iou_pred")
    boxes_l, scores_l, labels_l, valid_l = [], [], [], []
    start = 0
    for li, count in enumerate(level_counts):
        sl = slice(start, start + count)
        b, s, l, v = _select_level_batched(
            outputs["cls_logits"][:, sl],
            outputs["box_regression"][:, sl],
            None if iou_pred is None else iou_pred[:, sl],
            anchors[sl],
            pp,
            decode_fn=decode_fn,
            reg_scale=1.0 if reg_scales is None else reg_scales[li],
        )
        boxes_l.append(b)
        scores_l.append(s)
        labels_l.append(l)
        valid_l.append(v)
        start += count

    boxes = jnp.concatenate(boxes_l, axis=1)
    scores = jnp.concatenate(scores_l, axis=1)
    labels = jnp.concatenate(labels_l, axis=1)
    valid = jnp.concatenate(valid_l, axis=1)

    # (B, 2) sizes broadcast as (B, 1) against the (B, K) coord arrays
    boxes = clip_to_image(boxes, image_sizes.astype(boxes.dtype))

    # one batched NMS kernel for the whole batch (images advance their
    # suppression loops in lock-step); only gather + voting stay vmapped
    keep_idx, keep_scores, keep_valid = nms_batched(
        boxes, scores, labels, valid, pp.nms_thresh,
        pp.detections_per_img, class_aware=True,
    )

    def gather_and_vote(keep_idx_i, keep_valid_i,
                        boxes_i, scores_i, labels_i, valid_i):
        kept_boxes = boxes_i[keep_idx_i]
        kept_labels = labels_i[keep_idx_i]
        if pp.score_voting:
            kept_boxes = _score_vote(
                kept_boxes, kept_labels, keep_valid_i,
                boxes_i, scores_i, labels_i, valid_i,
            )
        return kept_boxes, kept_labels

    kept_boxes, kept_labels = jax.vmap(gather_and_vote)(
        keep_idx, keep_valid, boxes, scores, labels, valid
    )
    return {
        "boxes": jnp.where(keep_valid[..., None], kept_boxes, 0.0),
        "scores": jnp.where(keep_valid, keep_scores, 0.0),
        "labels": jnp.where(keep_valid, kept_labels, 0),
        "valid": keep_valid,
    }
