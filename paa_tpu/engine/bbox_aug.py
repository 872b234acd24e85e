"""Test-time augmentation (multi-scale testing).

Re-implements reference paa_core/engine/bbox_aug.py (identity + hflip +
scales (+scale-hflip), merged by one final class-aware NMS at
MODEL.FCOS.NMS_TH capped to TEST.DETECTIONS_PER_IMG) and
bbox_aug_vote.py (per-scale box-area gating via TEST.BBOX_AUG.SCALE_RANGES
:37-51, merge via bbox voting / soft voting / nms :203-310, capped to
MODEL.ATSS.PRE_NMS_TOP_N).

TPU redesign: each (scale, flip) augmentation runs the per-bucket jitted
forward+postprocess once per batch; the merge logic runs in numpy on host
(it is numpy in the reference too). With VOTE the per-aug detections are
fully post-processed (NMS + cap + optional score voting) before merging —
matching PAAPostProcessor.forward's ``bbox_aug_vote`` gate
(paa/inference.py:96-97); without VOTE the per-aug PRE-NMS candidates are
pooled and a single NMS runs at the end.
"""

from __future__ import annotations

import logging
import math
import time
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import get_resize_size
from ..modeling.paa_inference import _postprocess_single


def _ceil32(x):
    return int(math.ceil(x / 32) * 32)


def np_greedy_ml_nms(boxes, scores, labels, thresh, max_out):
    """Host greedy class-aware NMS, +1 IoU convention, pick-max style."""
    scores = scores.copy().astype(np.float64)
    keep = []
    for _ in range(max_out):
        i = int(scores.argmax())
        if scores[i] <= -1e30:
            break
        keep.append(i)
        lt = np.maximum(boxes[i, :2], boxes[:, :2])
        rb = np.minimum(boxes[i, 2:], boxes[:, 2:])
        wh = np.clip(rb - lt + 1, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        a1 = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
        a2 = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
        iou = inter / (a1 + a2 - inter)
        scores[(iou > thresh) & (labels == labels[i])] = -1e31
        scores[i] = -1e31
    return np.asarray(keep, dtype=np.int64)


def _vote_clusters(boxes, scores, vote_thresh):
    """Greedy score-ordered clustering on the pairwise +1-IoU matrix.

    The spec (reference bbox_aug_vote.py:203-310): walk detections in
    descending score order; each yet-unclustered detection seeds a
    cluster of every remaining detection with IoU >= vote_thresh to it.
    Implemented here as mask updates over one precomputed IoU matrix
    (the repo's idiom) instead of the reference's repeated array
    deletion.

    Returns (b, s, cluster, seed_iou, n_clusters): score-sorted float64
    boxes/scores, each detection's cluster id (ids are in seed-score
    order), and its IoU against its cluster's seed.
    """
    order = scores.argsort()[::-1]
    b = boxes[order].astype(np.float64)
    s = scores[order].astype(np.float64)
    n = len(s)
    area = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = np.maximum(b[:, None, :2], b[None, :, :2])
    rb = np.minimum(b[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    iou = inter / (area[:, None] + area[None, :] - inter)

    cluster = np.full(n, -1, dtype=np.int64)
    seed_iou = np.zeros(n)
    unassigned = np.ones(n, dtype=bool)
    k = 0
    while unassigned.any():
        seed = int(unassigned.argmax())  # highest-score unassigned
        members = unassigned & (iou[seed] >= vote_thresh)
        cluster[members] = k
        seed_iou[members] = iou[seed, members]
        unassigned &= ~members
        k += 1
    return b, s, cluster, seed_iou, k


def _merge_clusters(b, s, cluster, k):
    """Score-weighted box average and max score per cluster."""
    wsum = np.stack(
        [
            np.bincount(cluster, weights=b[:, d] * s, minlength=k)
            for d in range(4)
        ],
        axis=1,
    )
    ssum = np.bincount(cluster, weights=s, minlength=k)
    # detections are score-sorted, so each cluster's first member (its
    # seed) carries the cluster max score
    smax = np.zeros(k)
    np.maximum.at(smax, cluster, s)
    return wsum / ssum[:, None], smax


def bbox_vote(boxes, scores, vote_thresh):
    """IoU-cluster detections, emit one score-weighted average box with
    the cluster max score per cluster (reference bbox_aug_vote.py:203-249
    semantics; equivalence-tested in tests/test_bbox_aug.py)."""
    if boxes.shape[0] <= 1:
        return np.zeros((0, 4)), np.zeros((0,))
    b, s, cluster, _, k = _vote_clusters(boxes, scores, vote_thresh)
    merged, smax = _merge_clusters(b, s, cluster, k)
    return merged, smax


def soft_bbox_vote(boxes, scores, vote_thresh, score_thresh):
    """Like bbox_vote, but members of multi-detection clusters survive
    with soft-NMS-style decayed scores ``s * (1 - IoU_to_seed)`` when
    still above ``score_thresh``; output is re-sorted by score
    (reference bbox_aug_vote.py:252-310 semantics)."""
    if boxes.shape[0] <= 1:
        return np.zeros((0, 4)), np.zeros((0,))
    b, s, cluster, seed_iou, k = _vote_clusters(boxes, scores, vote_thresh)
    merged, smax = _merge_clusters(b, s, cluster, k)

    sizes = np.bincount(cluster, minlength=k)
    soft_s = s * (1 - seed_iou)
    keep = (sizes[cluster] > 1) & (soft_s >= score_thresh)

    all_boxes = np.concatenate([merged, b[keep]])
    all_scores = np.concatenate([smax, soft_s[keep]])
    order = all_scores.argsort()[::-1]
    return all_boxes[order], all_scores[order]


def build_aug_list(cfg):
    """[(scale, max_size, hflip, scale_range or None), ...]; first entry
    is the identity transform."""
    augs = [(cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST, False, None)]
    if cfg.TEST.BBOX_AUG.H_FLIP:
        augs.append(
            (cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST, True, None)
        )
    ranges = cfg.TEST.BBOX_AUG.SCALE_RANGES
    for idx, scale in enumerate(cfg.TEST.BBOX_AUG.SCALES):
        max_size = cfg.TEST.BBOX_AUG.MAX_SIZE
        if scale < 800:
            max_size = cfg.INPUT.MAX_SIZE_TEST
        rng = tuple(ranges[idx]) if idx < len(ranges) else None
        augs.append((scale, max_size, False, rng))
        if cfg.TEST.BBOX_AUG.SCALE_H_FLIP:
            augs.append((scale, max_size, True, rng))
    return augs


class TTAEngine:
    """Runs per-aug jitted inference; one compiled program per padded
    shape, cached."""

    def __init__(self, cfg, model, variables):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.pp = model.postprocess_config()
        self._fns = {}
        self.vote = cfg.TEST.BBOX_AUG.VOTE

    def _get_fn(self, hw, collect_candidates):
        key = (hw, collect_candidates)
        if key not in self._fns:
            anchors, counts = self.model.anchors_for(hw)
            anchors = jnp.asarray(anchors)
            pp = self.pp

            from ..ops.image_norm import maybe_device_normalize

            mean = self.cfg.INPUT.PIXEL_MEAN
            std = self.cfg.INPUT.PIXEL_STD

            if collect_candidates:
                from dataclasses import replace

                from ..modeling.paa_inference import _select_level
                from ..structures.boxes import clip_to_image

                @jax.jit
                def fn(images, image_sizes):
                    images = maybe_device_normalize(
                        images, image_sizes, mean, std
                    )
                    out = self.model.module.apply(self.variables, images)
                    iou_pred = out.get("iou_pred")

                    def single(cls_l, reg_l, iou_l, size):
                        bs, ss, ls, vs = [], [], [], []
                        start = 0
                        for count in counts:
                            sl = slice(start, start + count)
                            b, s, l, v = _select_level(
                                cls_l[sl], reg_l[sl],
                                None if iou_pred is None else iou_l[sl],
                                anchors[sl], pp,
                            )
                            bs.append(b)
                            ss.append(s)
                            ls.append(l)
                            vs.append(v)
                            start += count
                        boxes = jnp.concatenate(bs)
                        boxes = clip_to_image(
                            boxes, size.astype(boxes.dtype)
                        )
                        return {
                            "boxes": boxes,
                            "scores": jnp.concatenate(ss),
                            "labels": jnp.concatenate(ls),
                            "valid": jnp.concatenate(vs),
                        }

                    return jax.vmap(single)(
                        out["cls_logits"], out["box_regression"],
                        out.get("iou_pred"), image_sizes,
                    )
            else:

                @jax.jit
                def fn(images, image_sizes):
                    images = maybe_device_normalize(
                        images, image_sizes, mean, std
                    )
                    out = self.model.module.apply(self.variables, images)
                    return self.model.postprocess(
                        out, image_sizes, anchors, counts
                    )

            self._fns[key] = fn
        return self._fns[key]

    def detect_batch(self, raw_images):
        """raw_images: list of HWC uint8 BGR. Returns merged per-image
        (boxes_xyxy in ORIGINAL image coords, scores, labels)."""
        import cv2

        cfg = self.cfg
        augs = build_aug_list(cfg)
        per_image: List[List[Tuple]] = [[] for _ in raw_images]

        for scale, max_size, hflip, srange in augs:
            bucket_h = _ceil32(min(scale, max_size))
            bucket_w = _ceil32(max_size)
            # resize + flip + pad; batches ship as RAW uint8 — the
            # jitted fn normalizes on device (4x less H2D traffic;
            # measured 20.8 s of a 24 s 6-aug batch was float32 H2D)
            batch = []
            sizes = []
            for img in raw_images:
                h, w = img.shape[:2]
                oh, ow = get_resize_size((w, h), scale, max_size)
                r = cv2.resize(img, (ow, oh),
                               interpolation=cv2.INTER_LINEAR)
                if hflip:
                    r = np.ascontiguousarray(r[:, ::-1])
                bh = max(bucket_h, _ceil32(oh))
                bw = max(bucket_w, _ceil32(ow))
                batch.append((r, bh, bw))
                sizes.append((oh, ow))
            bh = max(b for _, b, _ in batch)
            bw = max(b for _, _, b in batch)
            images = np.zeros((len(batch), bh, bw, 3), np.uint8)
            for i, (r, _, _) in enumerate(batch):
                images[i, : r.shape[0], : r.shape[1]] = r

            fn = self._get_fn((bh, bw), collect_candidates=not self.vote)
            det = fn(
                jnp.asarray(images),
                jnp.asarray(np.asarray(sizes, np.float32)),
            )
            det = jax.tree_util.tree_map(np.asarray, det)

            for i, img in enumerate(raw_images):
                valid = det["valid"][i]
                boxes = det["boxes"][i][valid]
                scores = det["scores"][i][valid]
                labels = det["labels"][i][valid]
                oh, ow = sizes[i]
                if hflip:
                    # undo flip: BoxList.transpose(0) in the scaled space
                    x1 = ow - boxes[:, 2] - 1.0
                    x2 = ow - boxes[:, 0] - 1.0
                    boxes = np.stack(
                        [x1, boxes[:, 1], x2, boxes[:, 3]], axis=1
                    )
                if srange is not None:
                    # area gating in the SCALED space (+1 convention)
                    w_ = boxes[:, 2] - boxes[:, 0] + 1
                    h_ = boxes[:, 3] - boxes[:, 1] + 1
                    a = w_ * h_
                    keep = (a > srange[0] ** 2) & (a < srange[1] ** 2)
                    boxes, scores, labels = (
                        boxes[keep], scores[keep], labels[keep]
                    )
                # to original coords
                h, w = img.shape[:2]
                boxes = boxes * np.array(
                    [w / ow, h / oh, w / ow, h / oh], np.float32
                )
                per_image[i].append((boxes, scores, labels))

        results = []
        for i in range(len(raw_images)):
            boxes = np.concatenate([b for b, _, _ in per_image[i]])
            scores = np.concatenate([s for _, s, _ in per_image[i]])
            labels = np.concatenate([l for _, _, l in per_image[i]])
            results.append(self._merge(boxes, scores, labels))
        return results

    def _merge(self, boxes, scores, labels):
        cfg = self.cfg
        if not self.vote:
            # one final class-aware NMS at FCOS.NMS_TH, cap
            # TEST.DETECTIONS_PER_IMG (bbox_aug.py:66-68)
            keep = np_greedy_ml_nms(
                boxes, scores, labels, cfg.MODEL.FCOS.NMS_TH,
                cfg.TEST.DETECTIONS_PER_IMG,
            )
            return boxes[keep], scores[keep], labels[keep]

        # vote merge per class (bbox_aug_vote.py:139-177)
        merge_type = cfg.TEST.BBOX_AUG.MERGE_TYPE
        vote_th = cfg.TEST.BBOX_AUG.VOTE_TH
        out_b, out_s, out_l = [], [], []
        for j in np.unique(labels):
            sel = labels == j
            bj, sj = boxes[sel], scores[sel]
            if merge_type == "vote":
                vb, vs = bbox_vote(bj, sj, vote_th)
            elif merge_type == "soft-vote":
                vb, vs = soft_bbox_vote(
                    bj, sj, vote_th, cfg.MODEL.RETINANET.INFERENCE_TH
                )
            else:  # plain nms
                keep = np_greedy_ml_nms(
                    bj, sj, np.zeros(len(sj)), cfg.MODEL.ATSS.NMS_TH,
                    len(sj),
                )
                vb, vs = bj[keep], sj[keep]
            out_b.append(vb)
            out_s.append(vs)
            out_l.append(np.full(len(vs), j, dtype=np.int64))
        boxes = np.concatenate(out_b) if out_b else np.zeros((0, 4))
        scores = np.concatenate(out_s) if out_s else np.zeros((0,))
        labels = np.concatenate(out_l) if out_l else np.zeros((0,), np.int64)
        cap = cfg.MODEL.ATSS.PRE_NMS_TOP_N
        if len(scores) > cap:
            top = np.argsort(-scores, kind="stable")[:cap]
            boxes, scores, labels = boxes[top], scores[top], labels[top]
        return boxes, scores, labels


def inference_tta(cfg, model, variables, dataset, output_folder=None,
                  logger=None):
    """Full-dataset TTA evaluation (the TEST.BBOX_AUG.ENABLED path of
    compute_on_dataset, engine/inference.py:28-32)."""
    logger = logger or logging.getLogger("paa_tpu.inference")
    engine = TTAEngine(cfg, model, variables)
    batch_size = cfg.TEST.IMS_PER_BATCH

    predictions = {}
    t0 = time.time()
    for start in range(0, len(dataset.records), batch_size):
        idxs = range(
            start, min(start + batch_size, len(dataset.records))
        )
        raw = [dataset.load_image(i) for i in idxs]
        merged = engine.detect_batch(raw)
        for i, (boxes, scores, labels) in zip(idxs, merged):
            xywh = np.stack(
                [
                    boxes[:, 0],
                    boxes[:, 1],
                    boxes[:, 2] - boxes[:, 0] + 1.0,
                    boxes[:, 3] - boxes[:, 1] + 1.0,
                ],
                axis=1,
            ) if len(boxes) else np.zeros((0, 4))
            predictions[dataset.records[i].id] = dict(
                boxes_xywh=xywh, scores=scores, labels=labels
            )
    n = len(predictions)
    if n:
        logger.info(f"TTA eval: {(time.time() - t0) / n:.3f} s/img")

    from ..evaluation.coco_eval import COCOEvaluator, format_results

    cat_ids = sorted(dataset.contiguous_category_id_to_json_id.values())
    detections = {
        img_id: dict(
            boxes_xywh=p["boxes_xywh"],
            scores=p["scores"],
            category_ids=np.asarray(
                [
                    dataset.contiguous_category_id_to_json_id[int(l)]
                    for l in p["labels"]
                ],
                dtype=np.int64,
            ),
        )
        for img_id, p in predictions.items()
    }
    evaluator = COCOEvaluator(
        dataset._raw_annotations, cat_ids,
        [r.id for r in dataset.records],
    )
    results = evaluator.evaluate(detections)
    logger.info("\n" + format_results(results))
    return results
