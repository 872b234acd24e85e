"""Parity tests: vectorized PAA loss vs a numpy mirror of the reference
algorithm (paa_core/modeling/rpn/paa/loss.py), using the same
fixed-iteration EM in both (the EM itself is validated against
sklearn-equivalent semantics in test_gmm.py)."""

import numpy as np
import jax.numpy as jnp

from paa_tpu.modeling.anchors import AnchorGenerator
from paa_tpu.modeling.paa_loss import PAALossConfig, paa_loss

GAMMA, ALPHA = 2.0, 0.25
IOU_TH = 0.1
TOPK = 4
GMM_ITERS = 64


# ---------------- numpy reference mirror ----------------

def np_sigmoid(x):
    return 1 / (1 + np.exp(-x))


def np_focal(logits, targets):
    C = logits.shape[1]
    cr = np.arange(1, C + 1)[None, :]
    t = targets[:, None]
    p = np_sigmoid(logits.astype(np.float64))
    term1 = (1 - p) ** GAMMA * np.log(p)
    term2 = p ** GAMMA * np.log(1 - p)
    return (
        -((t == cr).astype(np.float64)) * term1 * ALPHA
        - ((t != cr) & (t >= 0)).astype(np.float64) * term2 * (1 - ALPHA)
    )


def np_iou_matrix(a, b):
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def np_match(iou):
    """Matcher with both thresholds IOU_TH + low-quality recovery."""
    matched_vals = iou.max(0)
    all_matches = iou.argmax(0)
    matches = np.where(matched_vals >= IOU_TH, all_matches, -1)
    highest = iou.max(1)
    for g in range(iou.shape[0]):
        ties = np.nonzero(iou[g] == highest[g])[0]
        matches[ties] = all_matches[ties]
    return matches


def np_encode(gt, anchors):
    ew = anchors[:, 2] - anchors[:, 0] + 1
    eh = anchors[:, 3] - anchors[:, 1] + 1
    ex = (anchors[:, 2] + anchors[:, 0]) / 2
    ey = (anchors[:, 3] + anchors[:, 1]) / 2
    gw = gt[:, 2] - gt[:, 0] + 1
    gh = gt[:, 3] - gt[:, 1] + 1
    gx = (gt[:, 2] + gt[:, 0]) / 2
    gy = (gt[:, 3] + gt[:, 1]) / 2
    return np.stack(
        [10 * (gx - ex) / ew, 10 * (gy - ey) / eh,
         5 * np.log(gw / ew), 5 * np.log(gh / eh)], axis=1
    )


def np_decode(preds, anchors):
    import math
    w = anchors[:, 2] - anchors[:, 0] + 1
    h = anchors[:, 3] - anchors[:, 1] + 1
    cx = (anchors[:, 2] + anchors[:, 0]) / 2
    cy = (anchors[:, 3] + anchors[:, 1]) / 2
    dx, dy = preds[:, 0] / 10, preds[:, 1] / 10
    dw = np.minimum(preds[:, 2] / 5, math.log(1000 / 16))
    dh = np.minimum(preds[:, 3] / 5, math.log(1000 / 16))
    pcx, pcy = dx * w + cx, dy * h + cy
    pw, ph = np.exp(dw) * w, np.exp(dh) * h
    return np.stack(
        [pcx - 0.5 * (pw - 1), pcy - 0.5 * (ph - 1),
         pcx + 0.5 * (pw - 1), pcy + 0.5 * (ph - 1)], axis=1
    )


def np_giou_loss(pred_deltas, target_deltas, anchors):
    pred = np_decode(pred_deltas, anchors)
    px1, py1 = pred[:, 0], pred[:, 1]
    px2 = np.maximum(px1, pred[:, 2])
    py2 = np.maximum(py1, pred[:, 3])
    pa = (px2 - px1) * (py2 - py1)
    gt = np_decode(target_deltas, anchors)
    gx1, gy1, gx2, gy2 = gt.T
    ga = (gx2 - gx1) * (gy2 - gy1)
    x1i, y1i = np.maximum(px1, gx1), np.maximum(py1, gy1)
    x2i, y2i = np.minimum(px2, gx2), np.minimum(py2, gy2)
    inter = np.where((y2i > y1i) & (x2i > x1i), (x2i - x1i) * (y2i - y1i), 0.0)
    x1e, y1e = np.minimum(px1, gx1), np.minimum(py1, gy1)
    x2e, y2e = np.maximum(px2, gx2), np.maximum(py2, gy2)
    enc = (x2e - x1e) * (y2e - y1e) + 1e-7
    union = pa + ga - inter + 1e-7
    ious = inter / union
    gious = ious - (enc - union) / enc
    return 1 - gious


def np_em(x, iters=GMM_ITERS, tol=1e-3):
    """EM matching ops/gmm.py semantics (sklearn-style tol early stop,
    checked after the M step)."""
    means = np.array([x.min(), x.max()])
    variances = np.array([1.0, 1.0])
    weights = np.array([0.5, 0.5])
    prev_lb = -np.inf
    for _ in range(iters):
        lp = (
            -0.5 * ((x[:, None] - means[None]) ** 2 / variances[None]
                    + np.log(variances[None]) + np.log(2 * np.pi))
            + np.log(weights[None])
        )
        lse = np.logaddexp(lp[:, 0], lp[:, 1])
        lb = lse.mean()
        resp = np.exp(lp - lse[:, None])
        nk = resp.sum(0) + 1e-12
        means = (resp * x[:, None]).sum(0) / nk
        variances = (resp * (x[:, None] - means[None]) ** 2).sum(0) / nk + 1e-6
        weights = nk / len(x)
        if abs(lb - prev_lb) < tol:
            break
        prev_lb = lb
    lp = (
        -0.5 * ((x[:, None] - means[None]) ** 2 / variances[None]
                + np.log(variances[None]) + np.log(2 * np.pi))
        + np.log(weights[None])
    )
    return lp.argmax(1), np.logaddexp(lp[:, 0], lp[:, 1])


def reference_paa_labels(gt_boxes, gt_labels, anchors, level_counts,
                         cls_logits, box_regression):
    """Mirror of prepare_iou_based_targets + anchor scoring + compute_paa
    for one image. Returns (iou_labels, paa_labels, pos_mask)."""
    n = anchors.shape[0]
    iou = np_iou_matrix(gt_boxes, anchors)
    matches = np_match(iou)

    iou_labels = np.where(matches >= 0, gt_labels[np.maximum(matches, 0)], 0)
    matched_boxes = gt_boxes[np.maximum(matches, 0)]
    reg_targets = np_encode(matched_boxes, anchors)

    cls_score = np_focal(cls_logits, iou_labels).sum(1)
    reg_score = np.full(n, 1e8)
    pos = iou_labels > 0
    reg_score[pos] = np_giou_loss(
        box_regression[pos], reg_targets[pos], anchors[pos]
    )
    combined = cls_score + reg_score

    # candidate selection per gt per level
    paa_labels = np.zeros(n, dtype=np.int64)
    pos_mask = np.zeros(n, dtype=bool)
    for g in range(len(gt_boxes)):
        cand = []
        start = 0
        for count in level_counts:
            sl = np.arange(start, start + count)
            match_idx = sl[(matches[sl] == g) & (iou_labels[sl] > 0)]
            if len(match_idx) > 0:
                k = min(len(match_idx), TOPK)
                top = match_idx[np.argsort(combined[match_idx],
                                           kind="stable")[:k]]
                cand.append(top)
            start += count
        if not cand:
            continue
        cand = np.concatenate(cand)
        if len(cand) > 1:
            order = np.argsort(combined[cand], kind="stable")
            x = combined[cand][order]
            comp, scores = np_em(x)
            fgs = comp == 0
            if fgs.sum() > 0:
                fg_max = scores[fgs].max()
                fg_max_idx = np.nonzero(fgs & (scores == fg_max))[0].min()
                is_pos = order[: fg_max_idx + 1]
            else:
                is_pos = order
        else:
            is_pos = np.array([0])
        pos_idx = cand[is_pos]
        paa_labels[pos_idx] = gt_labels[g]
        pos_mask[pos_idx] = True
    return iou_labels, paa_labels, pos_mask


# ---------------- test scenario ----------------

def build_scenario(seed):
    rng = np.random.RandomState(seed)
    gen = AnchorGenerator(
        sizes=((32,), (64,)), aspect_ratios=(1.0,), strides=(8, 16)
    )
    shapes = [(10, 12), (5, 6)]
    anchors, counts = gen(shapes)
    n = anchors.shape[0]
    C = 5
    # GTs sized to overlap several anchors
    gt_boxes = np.array(
        [
            [6, 6, 40, 44],
            [30, 20, 90, 75],
            [50, 8, 80, 38],
        ],
        dtype=np.float32,
    )
    gt_labels = np.array([1, 3, 2], dtype=np.int32)
    logits = rng.normal(-3, 1.5, size=(n, C)).astype(np.float32)
    reg = rng.normal(0, 0.4, size=(n, 4)).astype(np.float32)
    iou_pred = rng.normal(0, 1, size=(n,)).astype(np.float32)
    return anchors, counts, gt_boxes, gt_labels, logits, reg, iou_pred


def test_paa_assignment_matches_reference():
    anchors, counts, gt_boxes, gt_labels, logits, reg, iou_pred = (
        build_scenario(0)
    )
    ref_iou_labels, ref_paa_labels, ref_pos = reference_paa_labels(
        gt_boxes.astype(np.float64), gt_labels, anchors.astype(np.float64),
        counts, logits, reg,
    )

    G = 6  # pad GTs
    gt_boxes_p = np.zeros((1, G, 4), dtype=np.float32)
    gt_boxes_p[0, :3] = gt_boxes
    gt_labels_p = np.zeros((1, G), dtype=np.int32)
    gt_labels_p[0, :3] = gt_labels

    lc = PAALossConfig(topk=TOPK, gmm_iters=GMM_ITERS)
    out = paa_loss(
        {
            "cls_logits": jnp.asarray(logits[None]),
            "box_regression": jnp.asarray(reg[None]),
            "iou_pred": jnp.asarray(iou_pred[None]),
        },
        jnp.asarray(gt_boxes_p),
        jnp.asarray(gt_labels_p),
        jnp.asarray(anchors),
        counts,
        lc,
    )
    assert int(out["num_pos"]) == int(ref_pos.sum())

    # reconstruct the loss values from the numpy mirror
    num_pos_norm = max(ref_pos.sum(), 1.0)
    cls = np_focal(logits, ref_paa_labels).sum()
    ref_loss_cls = cls / num_pos_norm
    np.testing.assert_allclose(
        float(out["loss_cls"]), ref_loss_cls, rtol=2e-3
    )

    # reg + iou-pred losses
    matches = np_match(np_iou_matrix(gt_boxes.astype(np.float64),
                                     anchors.astype(np.float64)))
    matched_boxes = gt_boxes[np.maximum(matches, 0)]
    reg_targets = np_encode(matched_boxes.astype(np.float64),
                            anchors.astype(np.float64))
    gt_dec = np_decode(reg_targets[ref_pos], anchors[ref_pos])
    pred_dec = np_decode(reg[ref_pos].astype(np.float64), anchors[ref_pos])
    a1 = (gt_dec[:, 2] - gt_dec[:, 0] + 1) * (gt_dec[:, 3] - gt_dec[:, 1] + 1)
    a2 = (pred_dec[:, 2] - pred_dec[:, 0] + 1) * (pred_dec[:, 3] - pred_dec[:, 1] + 1)
    lt = np.maximum(gt_dec[:, :2], pred_dec[:, :2])
    rb = np.minimum(gt_dec[:, 2:], pred_dec[:, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    ious = inter / (a1 + a2 - inter)

    bce = -(ious * np.log(np_sigmoid(iou_pred[ref_pos].astype(np.float64)))
            + (1 - ious) * np.log(1 - np_sigmoid(iou_pred[ref_pos].astype(np.float64))))
    ref_iou_loss = bce.sum() / num_pos_norm * 0.5
    np.testing.assert_allclose(
        float(out["loss_iou_pred"]), ref_iou_loss, rtol=2e-3
    )

    reg_l = np_giou_loss(reg[ref_pos].astype(np.float64),
                         reg_targets[ref_pos], anchors[ref_pos])
    ref_loss_reg = (reg_l * ious).sum() / max(ious.sum(), 1e-6) * 1.3
    np.testing.assert_allclose(
        float(out["loss_reg"]), ref_loss_reg, rtol=2e-3
    )


def test_loss_gradients_finite():
    import jax

    anchors, counts, gt_boxes, gt_labels, logits, reg, iou_pred = (
        build_scenario(1)
    )
    G = 4
    gt_boxes_p = np.zeros((2, G, 4), dtype=np.float32)
    gt_boxes_p[:, :3] = gt_boxes
    gt_labels_p = np.zeros((2, G), dtype=np.int32)
    gt_labels_p[:, :3] = gt_labels

    lc = PAALossConfig(topk=TOPK, gmm_iters=8)

    def total(params):
        out = paa_loss(
            {
                "cls_logits": jnp.tile(params["l"][None], (2, 1, 1)),
                "box_regression": jnp.tile(params["r"][None], (2, 1, 1)),
                "iou_pred": jnp.tile(params["i"][None], (2, 1)),
            },
            jnp.asarray(gt_boxes_p),
            jnp.asarray(gt_labels_p),
            jnp.asarray(anchors),
            counts,
            lc,
        )
        return out["loss_cls"] + out["loss_reg"] + out["loss_iou_pred"]

    params = {
        "l": jnp.asarray(logits),
        "r": jnp.asarray(reg),
        "i": jnp.asarray(iou_pred),
    }
    val, grads = jax.value_and_grad(total)(params)
    assert np.isfinite(float(val))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


def test_zero_gt_image_contributes_background_only():
    anchors, counts, gt_boxes, gt_labels, logits, reg, iou_pred = (
        build_scenario(2)
    )
    gt_boxes_p = np.zeros((1, 3, 4), dtype=np.float32)
    gt_labels_p = np.zeros((1, 3), dtype=np.int32)
    lc = PAALossConfig(topk=TOPK, gmm_iters=8)
    out = paa_loss(
        {
            "cls_logits": jnp.asarray(logits[None]),
            "box_regression": jnp.asarray(reg[None]),
            "iou_pred": jnp.asarray(iou_pred[None]),
        },
        jnp.asarray(gt_boxes_p),
        jnp.asarray(gt_labels_p),
        jnp.asarray(anchors),
        counts,
        lc,
    )
    assert int(out["num_pos"]) == 0
    assert np.isfinite(float(out["loss_cls"]))
    assert float(out["loss_reg"]) == 0.0
