"""Pallas TPU kernel: fused greedy (multi-label) NMS.

The XLA formulation in ops/nms.py runs ``max_out`` scan iterations, each
a separate HLO loop step (argmax + IoU row + masked update) that
round-trips VMEM<->vector registers under XLA's scheduling. This kernel
keeps boxes/scores/labels resident in VMEM for the whole suppression
loop: one pallas_call does all ``max_out`` pick-the-max/suppress
iterations — the entire post-NMS selection is a single fused kernel.

Candidate counts are padded to a lane multiple (128) by the wrapper.
Semantics match ops/nms.nms exactly (same +1 IoU convention, label
gating, validity handling); equivalence is tested in interpret mode on
CPU and compiled on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _nms_kernel(boxes_ref, scores_ref, labels_ref, thresh_ref,
                keep_idx_ref, keep_scores_ref, keep_valid_ref,
                *, max_out, class_aware):
    x1 = boxes_ref[0, :]
    y1 = boxes_ref[1, :]
    x2 = boxes_ref[2, :]
    y2 = boxes_ref[3, :]
    labels = labels_ref[0, :]
    thresh = thresh_ref[0]
    n = x1.shape[0]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]
    m = keep_idx_ref.shape[1]
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)[0]

    def cond(carry):
        i, alive, *_ = carry
        return (i < max_out) & alive

    def body(carry):
        i, _, scores, out_idx, out_scores, out_valid = carry
        best_score = jnp.max(scores)
        # first index achieving the max
        is_best = scores == best_score
        idx = jnp.min(jnp.where(is_best, col_ids, n))
        idx = jnp.minimum(idx, n - 1)
        valid = best_score > _NEG_INF / 2

        # Mosaic has no dynamic scalar gather from vectors: extract the
        # picked box via masked reductions instead.
        sel = col_ids == idx
        bx1 = jnp.sum(jnp.where(sel, x1, 0.0))
        by1 = jnp.sum(jnp.where(sel, y1, 0.0))
        bx2 = jnp.sum(jnp.where(sel, x2, 0.0))
        by2 = jnp.sum(jnp.where(sel, y2, 0.0))
        barea = jnp.sum(jnp.where(sel, area, 0.0))
        blabel = jnp.sum(jnp.where(sel, labels, 0))

        lt_x = jnp.maximum(bx1, x1)
        lt_y = jnp.maximum(by1, y1)
        rb_x = jnp.minimum(bx2, x2)
        rb_y = jnp.minimum(by2, y2)
        w = jnp.maximum(rb_x - lt_x + 1.0, 0.0)
        h = jnp.maximum(rb_y - lt_y + 1.0, 0.0)
        inter = w * h
        iou = inter / (barea + area - inter)
        suppress = iou > thresh
        if class_aware:
            suppress = suppress & (labels == blabel)
        suppress = suppress | (col_ids == idx)

        # Mosaic can't store scalars at dynamic positions: update the
        # output vectors with a one-hot select instead.
        slot = out_cols == i
        out_idx = jnp.where(slot, idx, out_idx)
        out_scores = jnp.where(slot, best_score, out_scores)
        out_valid = jnp.where(slot, valid.astype(jnp.int32), out_valid)
        new_scores = jnp.where(suppress & valid, _NEG_INF, scores)
        # early exit once exhausted: remaining slots keep their init
        # values (score -inf => invalid), identical results
        return (i + 1, valid, new_scores,
                out_idx, out_scores, out_valid)

    init = (
        jnp.int32(0),
        True,
        scores_ref[0, :],
        jnp.zeros((m,), jnp.int32),
        jnp.full((m,), _NEG_INF, jnp.float32),
        jnp.zeros((m,), jnp.int32),
    )
    _, _, _, out_idx, out_scores, out_valid = jax.lax.while_loop(
        cond, body, init
    )
    keep_idx_ref[0, :] = out_idx
    keep_scores_ref[0, :] = out_scores
    keep_valid_ref[0, :] = out_valid


def _nms_kernel_batched(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref,
                        labels_ref, thresh_ref,
                        keep_idx_ref, keep_scores_ref, keep_valid_ref,
                        *, max_out, class_aware):
    """All images advance their suppression loops in lock-step.

    Identical per-row semantics to _nms_kernel, but every op is (B, N)
    so one fori_loop of ``max_out`` steps serves the whole batch — the
    sequential-loop overhead amortizes B-fold vs the vmap-as-grid
    lowering (measured 2.0x faster at B=16, N=5120 on v5e).
    """
    x1 = x1_ref[...]
    y1 = y1_ref[...]
    x2 = x2_ref[...]
    y2 = y2_ref[...]
    labels = labels_ref[...]
    thresh = thresh_ref[0]
    b, n = x1.shape
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    m = keep_idx_ref.shape[1]
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)

    def cond(carry):
        i, alive, *_ = carry
        return (i < max_out) & alive

    def body(carry):
        i, _, scores, out_idx, out_scores, out_valid = carry
        best = jnp.max(scores, axis=1, keepdims=True)  # (B, 1)
        is_best = scores == best
        idx = jnp.min(jnp.where(is_best, col_ids, n), axis=1,
                      keepdims=True)
        idx = jnp.minimum(idx, n - 1)
        valid = best > _NEG_INF / 2

        sel = col_ids == idx
        bx1 = jnp.sum(jnp.where(sel, x1, 0.0), axis=1, keepdims=True)
        by1 = jnp.sum(jnp.where(sel, y1, 0.0), axis=1, keepdims=True)
        bx2 = jnp.sum(jnp.where(sel, x2, 0.0), axis=1, keepdims=True)
        by2 = jnp.sum(jnp.where(sel, y2, 0.0), axis=1, keepdims=True)
        barea = jnp.sum(jnp.where(sel, area, 0.0), axis=1,
                        keepdims=True)
        blabel = jnp.sum(jnp.where(sel, labels, 0), axis=1,
                         keepdims=True)

        w = jnp.maximum(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1)
                        + 1.0, 0.0)
        h = jnp.maximum(jnp.minimum(by2, y2) - jnp.maximum(by1, y1)
                        + 1.0, 0.0)
        inter = w * h
        iou = inter / (barea + area - inter)
        suppress = iou > thresh
        if class_aware:
            suppress = suppress & (labels == blabel)
        suppress = suppress | sel

        slot = out_cols == i
        out_idx = jnp.where(slot, idx, out_idx)
        out_scores = jnp.where(slot, best, out_scores)
        out_valid = jnp.where(slot, valid.astype(jnp.int32), out_valid)
        new_scores = jnp.where(suppress & valid, _NEG_INF, scores)
        # early exit once every row is exhausted: remaining slots keep
        # their init values (score -inf => invalid), identical results
        return (i + 1, jnp.any(valid), new_scores,
                out_idx, out_scores, out_valid)

    init = (
        jnp.int32(0),
        True,
        scores_ref[...],
        jnp.zeros((b, m), jnp.int32),
        jnp.full((b, m), _NEG_INF, jnp.float32),
        jnp.zeros((b, m), jnp.int32),
    )
    _, _, _, out_idx, out_scores, out_valid = jax.lax.while_loop(
        cond, body, init
    )
    keep_idx_ref[...] = out_idx
    keep_scores_ref[...] = out_scores
    keep_valid_ref[...] = out_valid


@partial(jax.jit, static_argnames=("max_out", "class_aware"))
def nms_pallas_batched(boxes, scores, labels, valid, iou_threshold,
                       max_out, class_aware=True):
    """Batched drop-in for vmap(nms): boxes (B, N, 4), scores/labels/
    valid (B, N) -> keep_idx/keep_scores/keep_valid (B, max_out)."""
    bsz, n = scores.shape
    pad = max((-n) % 128, 256 - n if n < 256 else 0)
    bpad = (-bsz) % 8  # f32 sublane multiple
    if pad or bpad:
        boxes = jnp.pad(boxes, ((0, bpad), (0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, bpad), (0, pad)))
        labels = jnp.pad(labels, ((0, bpad), (0, pad)),
                         constant_values=-1)
        valid = jnp.pad(valid, ((0, bpad), (0, pad)))
    masked_scores = jnp.where(
        valid, scores.astype(jnp.float32), _NEG_INF
    )
    out_pad = -(-max_out // 128) * 128
    bp = bsz + bpad

    keep_idx, keep_scores, keep_valid = pl.pallas_call(
        partial(
            _nms_kernel_batched, max_out=max_out,
            class_aware=class_aware,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, out_pad), jnp.int32),
            jax.ShapeDtypeStruct((bp, out_pad), jnp.float32),
            jax.ShapeDtypeStruct((bp, out_pad), jnp.int32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        boxes[..., 0].astype(jnp.float32),
        boxes[..., 1].astype(jnp.float32),
        boxes[..., 2].astype(jnp.float32),
        boxes[..., 3].astype(jnp.float32),
        masked_scores,
        labels.astype(jnp.int32),
        jnp.asarray([iou_threshold], jnp.float32),
    )
    return (
        keep_idx[:bsz, :max_out],
        keep_scores[:bsz, :max_out],
        keep_valid[:bsz, :max_out].astype(bool),
    )


@partial(jax.jit, static_argnames=("max_out", "class_aware"))
def nms_pallas(boxes, scores, labels, valid, iou_threshold, max_out,
               class_aware=True):
    """Drop-in replacement for ops.nms.nms (same signature/returns)."""
    n = boxes.shape[0]
    # lane-multiple padding, minimum 256: Mosaic (Nov 2025 libtpu) dies
    # with a layout-rank check failure when the candidate vectors are
    # exactly one 128-lane tile wide
    pad = max((-n) % 128, 256 - n if n < 256 else 0)
    if pad:
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((pad, 4), boxes.dtype)], axis=0
        )
        scores = jnp.concatenate(
            [scores, jnp.zeros((pad,), scores.dtype)], axis=0
        )
        labels = jnp.concatenate(
            [labels, jnp.full((pad,), -1, labels.dtype)], axis=0
        )
        valid = jnp.concatenate(
            [valid, jnp.zeros((pad,), bool)], axis=0
        )
    npad = n + pad

    masked_scores = jnp.where(
        valid, scores.astype(jnp.float32), _NEG_INF
    )
    out_pad = -(-max_out // 128) * 128

    keep_idx, keep_scores, keep_valid = pl.pallas_call(
        partial(_nms_kernel, max_out=max_out, class_aware=class_aware),
        out_shape=(
            jax.ShapeDtypeStruct((1, out_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, out_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, out_pad), jnp.int32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        jnp.stack(
            [boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]]
        ).astype(jnp.float32),
        masked_scores[None],
        labels.astype(jnp.int32)[None],
        jnp.asarray([iou_threshold], jnp.float32),
    )
    return (
        keep_idx[0, :max_out],
        keep_scores[0, :max_out],
        keep_valid[0, :max_out].astype(bool),
    )
