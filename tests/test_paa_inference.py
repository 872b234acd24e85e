"""Parity test: static-shape PAA post-processing vs a numpy mirror of the
reference torch implementation (paa_core/modeling/rpn/paa/inference.py)."""

import numpy as np
import jax.numpy as jnp

from paa_tpu.modeling.paa_inference import PostProcessConfig, paa_postprocess
from paa_tpu.modeling.anchors import AnchorGenerator


# ---------------- numpy mirror of the reference ----------------

def np_decode(preds, anchors):
    import math

    w = anchors[:, 2] - anchors[:, 0] + 1
    h = anchors[:, 3] - anchors[:, 1] + 1
    cx = (anchors[:, 2] + anchors[:, 0]) / 2
    cy = (anchors[:, 3] + anchors[:, 1]) / 2
    dx = preds[:, 0] / 10.0
    dy = preds[:, 1] / 10.0
    dw = np.minimum(preds[:, 2] / 5.0, math.log(1000.0 / 16))
    dh = np.minimum(preds[:, 3] / 5.0, math.log(1000.0 / 16))
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = np.exp(dw) * w
    ph = np.exp(dh) * h
    return np.stack(
        [pcx - 0.5 * (pw - 1), pcy - 0.5 * (ph - 1),
         pcx + 0.5 * (pw - 1), pcy + 0.5 * (ph - 1)], axis=1
    )


def np_iou(a, b):
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def np_ml_nms(boxes, scores, labels, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ious = np_iou(boxes[i:i + 1], boxes)[0]
        suppressed |= (ious > thresh) & (labels == labels[i])
    return np.array(keep, dtype=np.int64)


def reference_postprocess(cls_logits, box_regression, iou_pred,
                          image_size, anchors_per_level, pp):
    """Numpy replica of PAAPostProcessor.forward for one image."""
    all_boxes, all_scores, all_labels = [], [], []
    start = 0
    for anchors in anchors_per_level:
        n = anchors.shape[0]
        sl = slice(start, start + n)
        logits = cls_logits[sl]
        reg = box_regression[sl]
        iou = iou_pred[sl]
        start += n

        cls_prob = 1 / (1 + np.exp(-logits))
        cand = cls_prob > pp.pre_nms_thresh
        count = int(cand.sum())
        k = min(count, pp.pre_nms_top_n)
        iou_prob = 1 / (1 + np.exp(-iou))
        fused = np.sqrt(cls_prob * iou_prob[:, None])
        flat = np.where(cand, fused, -np.inf).reshape(-1)
        top = np.argsort(-flat, kind="stable")[:k]
        loc = top // cls_prob.shape[1]
        cls = top % cls_prob.shape[1] + 1
        boxes = np_decode(reg[loc], anchors[loc])
        # clip
        h, w = image_size
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w - 1)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h - 1)
        all_boxes.append(boxes)
        all_scores.append(flat[top])
        all_labels.append(cls)

    boxes = np.concatenate(all_boxes)
    scores = np.concatenate(all_scores)
    labels = np.concatenate(all_labels)

    keep = np_ml_nms(boxes, scores, labels, pp.nms_thresh)
    if len(keep) > pp.detections_per_img:
        kept_scores = scores[keep]
        order = np.argsort(-kept_scores, kind="stable")
        keep = keep[order[: pp.detections_per_img]]

    result_boxes = boxes[keep].copy()
    result_scores = scores[keep]
    result_labels = labels[keep]

    if pp.score_voting:
        for j, (rb, rl) in enumerate(zip(result_boxes.copy(), result_labels)):
            mask = labels == rl
            cb, cs = boxes[mask], scores[mask]
            ious = np_iou(rb[None], cb)[0]
            pos = ious > 0.01
            if pos.sum() == 0:
                continue
            pis = np.exp(-(1 - ious[pos]) ** 2 / 0.025) * cs[pos]
            result_boxes[j] = (cb[pos] * pis[:, None]).sum(0) / pis.sum()

    return result_boxes, result_scores, result_labels


# ---------------- the test ----------------

def make_inputs(seed, n_per_level, num_classes=6):
    rng = np.random.RandomState(seed)
    n = sum(n_per_level)
    # mostly background logits with a few confident detections
    logits = rng.normal(-6.0, 1.0, size=(n, num_classes)).astype(np.float32)
    hot = rng.choice(n * num_classes, size=40, replace=False)
    logits.reshape(-1)[hot] = rng.normal(2.0, 1.0, size=40)
    reg = rng.normal(0, 0.5, size=(n, 4)).astype(np.float32)
    iou = rng.normal(0, 1.0, size=(n,)).astype(np.float32)
    return logits, reg, iou


def test_postprocess_matches_reference_numpy():
    strides = (8, 16)
    gen = AnchorGenerator(
        sizes=((64,), (128,)), aspect_ratios=(1.0,), strides=strides
    )
    shapes = [(8, 10), (4, 5)]
    anchors_per_level = gen.per_level(shapes)
    anchors_flat, counts = gen(shapes)

    pp = PostProcessConfig(
        pre_nms_thresh=0.05, pre_nms_top_n=50, nms_thresh=0.6,
        detections_per_img=10, num_classes=6, score_voting=True,
    )

    image_size = (64.0, 80.0)
    for seed in range(3):
        logits, reg, iou = make_inputs(seed, counts)

        ref_boxes, ref_scores, ref_labels = reference_postprocess(
            logits, reg, iou, image_size, anchors_per_level, pp
        )

        out = paa_postprocess(
            {
                "cls_logits": jnp.asarray(logits[None]),
                "box_regression": jnp.asarray(reg[None]),
                "iou_pred": jnp.asarray(iou[None]),
            },
            jnp.asarray(np.array([image_size], dtype=np.float32)),
            jnp.asarray(anchors_flat),
            counts,
            pp,
        )

        valid = np.asarray(out["valid"][0])
        got_boxes = np.asarray(out["boxes"][0])[valid]
        got_scores = np.asarray(out["scores"][0])[valid]
        got_labels = np.asarray(out["labels"][0])[valid]

        assert len(got_scores) == len(ref_scores), (
            f"seed {seed}: {len(got_scores)} vs {len(ref_scores)}"
        )
        # sort both by score desc for comparison
        o1 = np.argsort(-got_scores, kind="stable")
        o2 = np.argsort(-ref_scores, kind="stable")
        np.testing.assert_allclose(got_scores[o1], ref_scores[o2], rtol=1e-4)
        np.testing.assert_array_equal(got_labels[o1], ref_labels[o2])
        np.testing.assert_allclose(
            got_boxes[o1], ref_boxes[o2], rtol=1e-3, atol=1e-2
        )


def test_postprocess_no_iou_pred_and_batch():
    strides = (8,)
    gen = AnchorGenerator(sizes=((64,),), aspect_ratios=(1.0,),
                          strides=strides)
    shapes = [(6, 6)]
    anchors_flat, counts = gen(shapes)
    rng = np.random.RandomState(0)
    logits = rng.normal(-4, 2, size=(2, 36, 3)).astype(np.float32)
    reg = rng.normal(0, 0.3, size=(2, 36, 4)).astype(np.float32)
    pp = PostProcessConfig(
        pre_nms_top_n=20, detections_per_img=5, num_classes=3,
        score_voting=False,
    )
    out = paa_postprocess(
        {"cls_logits": jnp.asarray(logits), "box_regression": jnp.asarray(reg)},
        jnp.asarray(np.full((2, 2), 48.0, dtype=np.float32)),
        jnp.asarray(anchors_flat),
        counts,
        pp,
    )
    assert out["boxes"].shape == (2, 5, 4)
    assert out["valid"].dtype == bool


def test_batched_selection_matches_per_image_path():
    """paa_postprocess (batched selection with the compaction fast path
    and the top_k cond fallback) must produce identical detections to the
    original per-image vmap(_postprocess_single) formulation, in both
    candidate regimes."""
    import jax
    from functools import partial
    from paa_tpu.modeling.paa_inference import _postprocess_single

    rng = np.random.RandomState(11)
    level_counts = (48, 12)
    n = sum(level_counts)
    c = 6
    b = 3
    anchors = np.stack([
        rng.uniform(0, 60, n), rng.uniform(0, 60, n),
        rng.uniform(60, 130, n), rng.uniform(60, 130, n),
    ], axis=1).astype(np.float32)
    sizes = jnp.asarray(np.tile(np.array([[128.0, 144.0]]), (b, 1)),
                        jnp.float32)

    def run_both(cls_logits, pp):
        box_reg = rng.uniform(-0.4, 0.4, (b, n, 4)).astype(np.float32)
        iou_pred = rng.uniform(-2, 2, (b, n)).astype(np.float32)
        outputs = {
            "cls_logits": jnp.asarray(cls_logits),
            "box_regression": jnp.asarray(box_reg),
            "iou_pred": jnp.asarray(iou_pred),
        }
        new = paa_postprocess(outputs, sizes, jnp.asarray(anchors),
                              level_counts, pp)
        fn = partial(_postprocess_single, level_counts=level_counts, pp=pp)
        old = jax.vmap(
            lambda cl, bo, io, s: fn(cl, bo, io, s,
                                     anchors=jnp.asarray(anchors))
        )(outputs["cls_logits"], outputs["box_regression"],
          outputs["iou_pred"], sizes)
        return new, old

    pp = PostProcessConfig(
        pre_nms_thresh=0.05, pre_nms_top_n=50, nms_thresh=0.6,
        detections_per_img=10, num_classes=c, score_voting=True,
    )
    # sparse regime: few candidates above threshold -> compaction path
    sparse_logits = rng.normal(-6.0, 0.5, (b, n, c)).astype(np.float32)
    boost = rng.rand(b, n, c) < 0.05
    sparse_logits[boost] += 5.0  # sigmoid ~ 0.27 > 0.05
    # dense regime: nearly everything above threshold -> top_k fallback
    dense_logits = rng.normal(0.5, 1.0, (b, n, c)).astype(np.float32)

    # k > 128 with sparse candidates exercises the SMALL (128-slot)
    # compaction tier; the others cover the full tier and the top_k
    # fallback
    pp_tiered = PostProcessConfig(
        pre_nms_thresh=0.05, pre_nms_top_n=200, nms_thresh=0.6,
        detections_per_img=10, num_classes=c, score_voting=True,
    )
    for name, logits, p in [
        ("sparse", sparse_logits, pp),
        ("dense", dense_logits, pp),
        ("sparse-small-tier", sparse_logits, pp_tiered),
        ("dense-big-k", dense_logits, pp_tiered),
    ]:
        new, old = run_both(logits, p)
        for key in ("labels", "valid"):
            np.testing.assert_array_equal(
                np.asarray(new[key]), np.asarray(old[key]),
                err_msg=f"{name} regime: {key} diverged",
            )
        for key in ("boxes", "scores"):
            # XLA reassociates the decode/vote arithmetic differently
            # inside the tiered cond branches -> few-ULP wobble
            np.testing.assert_allclose(
                np.asarray(new[key]), np.asarray(old[key]),
                rtol=1e-5, atol=1e-5,
                err_msg=f"{name} regime: {key} diverged",
            )
