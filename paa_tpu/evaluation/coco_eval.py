"""COCO-style detection evaluation, pure numpy.

pycocotools is not available in this environment, so this reimplements
the COCOeval bbox protocol from scratch (matching pycocotools/cocoeval.py
semantics): 10 IoU thresholds 0.50:0.05:0.95, 101 recall points, maxDets
[1,10,100], area ranges all/small/medium/large, crowd-GT "iof" IoU,
greedy per-threshold matching preferring non-ignored GTs, and the
standard 12-number summary.

The wrapper mirrors the reference's do_coco_evaluation flow
(paa_core/data/datasets/evaluation/coco/coco_eval.py:13-67): predictions
are resized to original image coordinates by the caller, converted to
xywh with the +1 convention (BoxList.convert), and contiguous labels are
mapped back to json category ids.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.00, 101)
MAX_DETS = (1, 10, 100)
AREA_RNGS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}

METRICS = (
    "AP", "AP50", "AP75", "APs", "APm", "APl",
    "AR1", "AR10", "AR100", "ARs", "ARm", "ARl",
)


def _bbox_iou_xywh(dts, gts, iscrowd):
    """pycocotools maskUtils.iou for bboxes: plain w*h areas, crowd GTs
    use union = dt area. Uses the native C++ kernel when available."""
    from . import _native

    if len(dts) and len(gts) and _native.available():
        return _native.bbox_iou_xywh(dts, gts, iscrowd)
    d = np.asarray(dts, dtype=np.float64).reshape(-1, 4)
    g = np.asarray(gts, dtype=np.float64).reshape(-1, 4)
    ious = np.zeros((len(d), len(g)))
    for j, (gx, gy, gw, gh) in enumerate(g):
        ga = gw * gh
        x1 = np.maximum(d[:, 0], gx)
        y1 = np.maximum(d[:, 1], gy)
        x2 = np.minimum(d[:, 0] + d[:, 2], gx + gw)
        y2 = np.minimum(d[:, 1] + d[:, 3], gy + gh)
        iw = np.clip(x2 - x1, 0, None)
        ih = np.clip(y2 - y1, 0, None)
        inter = iw * ih
        da = d[:, 2] * d[:, 3]
        union = da if iscrowd[j] else da + ga - inter
        ious[:, j] = inter / np.maximum(union, 1e-12)
    return ious


def _oks_iou(dt_kps, gts):
    """pycocotools computeOks: per-(dt, gt) object keypoint similarity.

    dt_kps: (n_dt, K, 3) predicted keypoints (x, y, score).
    gts: list of GT annotation dicts with 'keypoints' (flat 3K list),
    'bbox' (xywh) and 'area'.
    """
    from ..structures.keypoints import OKS_SIGMAS

    n_d, n_g = len(dt_kps), len(gts)
    out = np.zeros((n_d, n_g))
    if not n_d or not n_g:
        return out
    variances = (2 * OKS_SIGMAS) ** 2
    k = len(OKS_SIGMAS)
    for j, g in enumerate(gts):
        gkp = np.asarray(
            g.get("keypoints") or [0.0] * (3 * k), dtype=np.float64
        ).reshape(-1, 3)
        xg, yg, vg = gkp[:, 0], gkp[:, 1], gkp[:, 2]
        k1 = int((vg > 0).sum())
        bx, by, bw, bh = g["bbox"]
        x0, x1 = bx - bw, bx + bw * 2
        y0, y1 = by - bh, by + bh * 2
        for i, d in enumerate(dt_kps):
            xd, yd = d[:, 0].astype(np.float64), d[:, 1].astype(np.float64)
            if k1 > 0:
                dx = xd - xg
                dy = yd - yg
            else:  # no visible GT kps: distance to the expanded box
                z = np.zeros(k)
                dx = np.maximum(z, x0 - xd) + np.maximum(z, xd - x1)
                dy = np.maximum(z, y0 - yd) + np.maximum(z, yd - y1)
            e = (dx ** 2 + dy ** 2) / variances / (
                g.get("area", bw * bh) + np.spacing(1)
            ) / 2
            if k1 > 0:
                e = e[vg > 0]
            out[i, j] = np.exp(-e).sum() / e.shape[0] if e.shape[0] else 0.0
    return out


def _match_img_py(ious, g_ig, g_crowd, dt_out_of_range):
    """Numpy fallback of the per-image greedy matching (the native C++
    kernel in csrc/cocoeval.cpp is preferred)."""
    T = len(IOU_THRS)
    n_dt, n_gt = ious.shape
    dtm = np.full((T, n_dt), -1, dtype=np.int64)
    gtm = np.full((T, n_gt), -1, dtype=np.int64)
    dt_ig = np.zeros((T, n_dt), dtype=bool)
    for t, thr in enumerate(IOU_THRS):
        for di in range(n_dt):
            best = min(thr, 1 - 1e-10)
            m = -1
            for gi in range(n_gt):
                # already-matched non-crowd GTs are unavailable
                # (crowd GTs may match many detections)
                if gtm[t, gi] >= 0 and not g_crowd[gi]:
                    continue
                if m > -1 and not g_ig[m] and g_ig[gi]:
                    break
                if ious[di, gi] < best:
                    continue
                best = ious[di, gi]
                m = gi
            if m == -1:
                dt_ig[t, di] = dt_out_of_range[di]
                continue
            dt_ig[t, di] = g_ig[m]
            dtm[t, di] = m
            gtm[t, m] = di
    return dtm, dt_ig


def _match_img(ious, g_ig, g_crowd, dt_out_of_range):
    from . import _native

    if _native.available():
        return _native.evaluate_img(
            ious, g_ig, g_crowd, dt_out_of_range, IOU_THRS
        )
    return _match_img_py(ious, g_ig, g_crowd, dt_out_of_range)


class COCOEvaluator:
    """Evaluates detections against COCO-style ground truth.

    gt: dict image_id -> list of annotation dicts with keys
        bbox (xywh), category_id (json id), iscrowd, area, optional ignore.
    """

    def __init__(self, gt_by_image: Dict[int, list], cat_ids: List[int],
                 image_ids: List[int], iou_type: str = "bbox",
                 image_sizes: Dict[int, tuple] = None):
        """iou_type 'segm' evaluates instance masks: detections carry
        ``masks_rle`` (list of RLE dicts, see evaluation/mask_rle.py) and
        GT ``segmentation`` polygons are rasterized at the original image
        size from ``image_sizes`` (img_id -> (h, w)). Mirrors the
        reference's pycocotools segm flavor
        (paa_core/data/datasets/evaluation/coco/coco_eval.py:13-67)."""
        assert iou_type in ("bbox", "segm", "keypoints"), iou_type
        self.iou_type = iou_type
        self.image_sizes = image_sizes or {}
        if iou_type == "keypoints":
            # pycocotools kps params: maxDets [20], areas all/medium/large
            self.max_dets = (20,)
            self.area_rngs = {
                k: AREA_RNGS[k] for k in ("all", "medium", "large")
            }
        else:
            self.max_dets = MAX_DETS
            self.area_rngs = AREA_RNGS
        self.cat_ids = list(cat_ids)
        self.image_ids = list(image_ids)
        self._gt = {}
        for img_id in self.image_ids:
            by_cat = defaultdict(list)
            for a in gt_by_image.get(img_id, []):
                by_cat[a["category_id"]].append(a)
            self._gt[img_id] = by_cat

    def evaluate(self, detections: Dict[int, dict]):
        """detections: image_id -> dict(boxes_xywh (n,4), scores (n,),
        category_ids (n,), [masks_rle (n,) for segm]). Returns dict of
        the 12 standard metrics plus per-metric values in [0,1] (or -1)."""
        T = len(IOU_THRS)
        R = len(REC_THRS)
        K = len(self.cat_ids)
        A = len(self.area_rngs)
        M = len(self.max_dets)
        max_det = max(self.max_dets)

        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        area_items = list(self.area_rngs.items())

        for k, cat_id in enumerate(self.cat_ids):
            # gather per-image eval results for this category
            per_image = []
            for img_id in self.image_ids:
                gts = self._gt[img_id].get(cat_id, [])
                det = detections.get(img_id)
                segm = self.iou_type == "segm"
                kps = self.iou_type == "keypoints"
                dt_rles = []
                dt_kps = np.zeros((0, 17, 3))
                if det is None:
                    dt_boxes = np.zeros((0, 4))
                    dt_scores = np.zeros((0,))
                else:
                    sel = np.asarray(det["category_ids"]) == cat_id
                    dt_boxes = np.asarray(det["boxes_xywh"])[sel]
                    dt_scores = np.asarray(det["scores"])[sel]
                    if segm:
                        dt_rles = [
                            det["masks_rle"][i]
                            for i in np.nonzero(sel)[0]
                        ]
                    if kps:
                        dt_kps = np.asarray(det["keypoints"])[sel]
                if len(gts) == 0 and len(dt_scores) == 0:
                    per_image.append(None)
                    continue
                order = np.argsort(-dt_scores, kind="mergesort")[:max_det]
                dt_boxes = dt_boxes[order]
                dt_scores = dt_scores[order]
                if segm:
                    dt_rles = [dt_rles[i] for i in order]
                if kps:
                    dt_kps = dt_kps[order]

                g_boxes = np.asarray([g["bbox"] for g in gts]).reshape(-1, 4)
                g_crowd = np.asarray(
                    [int(g.get("iscrowd", 0)) for g in gts], dtype=bool
                )
                g_ignore_base = np.asarray(
                    [
                        bool(g.get("ignore", 0)) or bool(g.get("iscrowd", 0))
                        # keypoints flavor ignores GTs without labeled
                        # keypoints (pycocotools _prepare)
                        or (kps and int(g.get("num_keypoints", 0)) == 0)
                        for g in gts
                    ],
                    dtype=bool,
                )
                g_area = np.asarray(
                    [
                        g.get("area", g["bbox"][2] * g["bbox"][3])
                        for g in gts
                    ],
                    dtype=np.float64,
                )
                if segm:
                    from . import mask_rle

                    gh, gw = self.image_sizes.get(img_id, (0, 0))
                    g_rles = [
                        mask_rle.polygons_to_rle(
                            g["segmentation"], gh, gw
                        )
                        for g in gts
                    ]
                    ious = mask_rle.iou(dt_rles, g_rles, g_crowd)
                    dt_area = np.asarray(
                        [mask_rle.area(r) for r in dt_rles],
                        dtype=np.float64,
                    )
                elif kps:
                    ious = _oks_iou(dt_kps, gts)
                    # pycocotools loadRes: dt area = keypoint extent box
                    if len(dt_kps):
                        xs, ys = dt_kps[..., 0], dt_kps[..., 1]
                        dt_area = (
                            (xs.max(1) - xs.min(1))
                            * (ys.max(1) - ys.min(1))
                        )
                    else:
                        dt_area = np.zeros((0,))
                else:
                    ious = _bbox_iou_xywh(dt_boxes, g_boxes, g_crowd)
                    dt_area = dt_boxes[:, 2] * dt_boxes[:, 3]
                per_image.append(
                    dict(
                        scores=dt_scores,
                        ious=ious,
                        g_ignore_base=g_ignore_base,
                        g_area=g_area,
                        g_crowd=g_crowd,
                        dt_area=dt_area,
                    )
                )

            for a, (_aname, (a_lo, a_hi)) in enumerate(area_items):
                # evaluateImg for every image at this area range
                img_evals = []
                for ev in per_image:
                    if ev is None:
                        img_evals.append(None)
                        continue
                    g_ig = ev["g_ignore_base"] | (
                        (ev["g_area"] < a_lo) | (ev["g_area"] > a_hi)
                    )
                    # gt order: non-ignored first (pycocotools sorts by
                    # ignore flag)
                    g_order = np.argsort(g_ig, kind="mergesort")
                    ious = ev["ious"][:, g_order]
                    g_ig_s = g_ig[g_order]
                    g_crowd_s = ev["g_crowd"][g_order]
                    n_dt, n_gt = ious.shape
                    out_of_rng = (
                        (ev["dt_area"] < a_lo) | (ev["dt_area"] > a_hi)
                    )

                    dtm, dt_ig = _match_img(
                        ious, g_ig_s, g_crowd_s, out_of_rng
                    )
                    img_evals.append(
                        dict(
                            scores=ev["scores"],
                            dtm=dtm,
                            dt_ig=dt_ig,
                            n_ig=int(g_ig_s.sum()),
                            n_gt=n_gt,
                        )
                    )

                for m, md in enumerate(self.max_dets):
                    scores_all, tps_all, ig_all = [], [], []
                    npig = 0
                    for ie in img_evals:
                        if ie is None:
                            continue
                        npig += ie["n_gt"] - ie["n_ig"]
                        s = ie["scores"][:md]
                        scores_all.append(s)
                        tps_all.append(ie["dtm"][:, :md] >= 0)
                        ig_all.append(ie["dt_ig"][:, :md])
                    if npig == 0:
                        continue
                    if scores_all:
                        scores_cat = np.concatenate(scores_all)
                        order = np.argsort(-scores_cat, kind="mergesort")
                        tps = np.concatenate(tps_all, axis=1)[:, order]
                        ig = np.concatenate(ig_all, axis=1)[:, order]
                    else:
                        tps = np.zeros((T, 0), dtype=bool)
                        ig = np.zeros((T, 0), dtype=bool)

                    tp = (tps & ~ig).astype(np.float64)
                    fp = (~tps & ~ig).astype(np.float64)
                    tp_sum = np.cumsum(tp, axis=1)
                    fp_sum = np.cumsum(fp, axis=1)
                    for t in range(T):
                        tp_c, fp_c = tp_sum[t], fp_sum[t]
                        nd = len(tp_c)
                        rc = tp_c / npig
                        pr = tp_c / np.maximum(tp_c + fp_c, np.finfo(
                            np.float64).eps)
                        recall[t, k, a, m] = rc[-1] if nd else 0.0
                        # monotone-from-right precision envelope
                        q = np.zeros(R)
                        if nd:
                            pr = pr.tolist()
                            for i in range(nd - 1, 0, -1):
                                if pr[i] > pr[i - 1]:
                                    pr[i - 1] = pr[i]
                            inds = np.searchsorted(rc, REC_THRS, side="left")
                            for ri, pi in enumerate(inds):
                                if pi < nd:
                                    q[ri] = pr[pi]
                        precision[:, :, k, a, m][t] = q

        self.precision = precision
        self.recall = recall
        return self.summarize()

    def _summ(self, ap, iou_thr=None, area="all", max_det=None):
        if max_det is None:
            max_det = max(self.max_dets)
        a = list(self.area_rngs.keys()).index(area)
        m = self.max_dets.index(max_det)
        if ap:
            s = self.precision[:, :, :, a, m]
            if iou_thr is not None:
                t = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                s = s[t]
        else:
            s = self.recall[:, :, a, m]
            if iou_thr is not None:
                t = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                s = s[t]
        valid = s[s > -1]
        return float(valid.mean()) if valid.size else -1.0

    def summarize(self):
        if self.iou_type == "keypoints":
            return {
                "AP": self._summ(True),
                "AP50": self._summ(True, iou_thr=0.5),
                "AP75": self._summ(True, iou_thr=0.75),
                "APm": self._summ(True, area="medium"),
                "APl": self._summ(True, area="large"),
                "AR": self._summ(False),
                "AR50": self._summ(False, iou_thr=0.5),
                "AR75": self._summ(False, iou_thr=0.75),
                "ARm": self._summ(False, area="medium"),
                "ARl": self._summ(False, area="large"),
            }
        return {
            "AP": self._summ(True),
            "AP50": self._summ(True, iou_thr=0.5),
            "AP75": self._summ(True, iou_thr=0.75),
            "APs": self._summ(True, area="small"),
            "APm": self._summ(True, area="medium"),
            "APl": self._summ(True, area="large"),
            "AR1": self._summ(False, max_det=1),
            "AR10": self._summ(False, max_det=10),
            "AR100": self._summ(False, max_det=100),
            "ARs": self._summ(False, area="small"),
            "ARm": self._summ(False, area="medium"),
            "ARl": self._summ(False, area="large"),
        }


def check_expected_results(results, expected_results, sigma_tol,
                           logger=None):
    """Regression assertion (reference coco_eval.py:403-422): each entry
    (task, metric, mean, std) must satisfy |actual - mean| <
    sigma_tol * std. Raises AssertionError otherwise (the
    quick_schedules configs rely on this). Tasks: 'bbox' reads the
    top-level metrics; 'segm'/'keypoints' read the flavor-prefixed
    entries produced by engine.inference."""
    for task, metric, mean, std in expected_results:
        key = metric if task == "bbox" else f"{task}/{metric}"
        if key not in results:
            if logger:
                logger.warning(f"no result for {task}/{metric}; skipping")
            continue
        actual = results[key]
        lo = mean - sigma_tol * std
        hi = mean + sigma_tol * std
        ok = lo < actual < hi
        msg = (
            f"{task}/{metric} = {actual:.4f}; expected {mean:.4f} "
            f"+/- {sigma_tol}*{std:.4f} -> ({lo:.4f}, {hi:.4f}): "
            f"{'OK' if ok else 'FAILED'}"
        )
        if logger:
            (logger.info if ok else logger.error)(msg)
        assert ok, msg


def format_results(results, task="bbox"):
    """COCOResults-style table (reference coco_eval.py:358-402)."""
    lines = [f"Task: {task}"]
    for k in METRICS:
        if k in results:
            lines.append(f"{k}: {results[k]:.4f}")
    for k in results:
        if k not in METRICS and "/" not in k:
            lines.append(f"{k}: {results[k]:.4f}")
    return "\n".join(lines)


PROPOSAL_AREAS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def evaluate_box_proposals(proposals, gt_by_image, image_ids,
                           thresholds=None, area="all", limit=None):
    """Proposal recall (reference coco_eval.py:189-300
    evaluate_box_proposals): greedily match each GT to its best-covering
    proposal, collect coverage IoUs, and average recall over IoU
    thresholds 0.5:0.05:0.95.

    proposals: img_id -> dict(boxes (n, 4) xyxy in ORIGINAL image
    coords sorted by descending objectness, already the NMS pick order).
    """
    lo, hi = PROPOSAL_AREAS[area]
    gt_overlaps = []
    num_pos = 0
    for img_id in image_ids:
        anns = [
            a for a in gt_by_image.get(img_id, [])
            if not a.get("iscrowd", 0)
        ]
        if not anns:
            continue
        g_xywh = np.asarray([a["bbox"] for a in anns], np.float64)
        g_areas = np.asarray(
            [a.get("area", b[2] * b[3]) for a, b in zip(anns, g_xywh)]
        )
        keep = (g_areas >= lo) & (g_areas <= hi)
        gt = np.stack(
            [
                g_xywh[:, 0],
                g_xywh[:, 1],
                g_xywh[:, 0] + g_xywh[:, 2] - 1.0,  # xywh->xyxy, +1 conv
                g_xywh[:, 1] + g_xywh[:, 3] - 1.0,
            ],
            axis=1,
        )[keep]
        num_pos += len(gt)
        if not len(gt):
            continue
        pred = proposals.get(img_id)
        if pred is None or not len(pred["boxes"]):
            continue
        boxes = np.asarray(pred["boxes"], np.float64)
        if limit is not None and len(boxes) > limit:
            boxes = boxes[:limit]

        # +1-convention pairwise IoU (boxlist_iou)
        a1 = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
        a2 = (gt[:, 2] - gt[:, 0] + 1) * (gt[:, 3] - gt[:, 1] + 1)
        lt = np.maximum(boxes[:, None, :2], gt[None, :, :2])
        rb = np.minimum(boxes[:, None, 2:], gt[None, :, 2:])
        wh = np.clip(rb - lt + 1, 0, None)
        overlaps = wh[..., 0] * wh[..., 1] / (
            a1[:, None] + a2[None, :] - wh[..., 0] * wh[..., 1]
        )

        covered = np.zeros(len(gt))
        for j in range(min(len(boxes), len(gt))):
            per_gt = overlaps.max(axis=0)
            gi = int(per_gt.argmax())
            bi = int(overlaps[:, gi].argmax())
            covered[j] = overlaps[bi, gi]
            overlaps[bi, :] = -1
            overlaps[:, gi] = -1
        gt_overlaps.append(covered)

    gt_overlaps = (
        np.sort(np.concatenate(gt_overlaps)) if gt_overlaps
        else np.zeros((0,))
    )
    if thresholds is None:
        thresholds = np.arange(0.5, 0.95 + 1e-5, 0.05)
    recalls = np.asarray(
        [
            (gt_overlaps >= t).sum() / max(num_pos, 1)
            for t in thresholds
        ]
    )
    return {
        "ar": float(recalls.mean()),
        "recalls": recalls,
        "thresholds": thresholds,
        "num_pos": num_pos,
    }
