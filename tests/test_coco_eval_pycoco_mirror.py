"""Adversarial COCOeval tests against an independent transcription of
pycocotools' evaluateImg/accumulate.

pycocotools itself is absent from this environment, so the goldens come
from `PycocoMirror` below — written line-by-line from the PUBLISHED
pycocotools algorithm (cocoeval.py evaluateImg/accumulate; the
reference drives it via
paa_core/data/datasets/evaluation/coco/coco_eval.py:305-402) and kept
deliberately naive (python loops, numpy mergesort) and structurally
independent of paa_tpu/evaluation/coco_eval.py. Targeted sharp edges
(VERDICT r2 item 6):

- stable-mergesort score-tie ordering across images,
- unmatched detections OUTSIDE the area range become ignored (not FP),
- crowd GTs: many-to-one matching, IoU = inter/dt_area, match loop does
  not skip already-matched crowds,
- maxDets truncation happens per image BEFORE matching,
- the match loop's break rule (once matched to a non-ignored GT, stop
  when reaching the ignored-GT tail),
- 101-point precision envelope + searchsorted interpolation.
"""

import numpy as np

from paa_tpu.evaluation.coco_eval import COCOEvaluator

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.00, 101)
AREA_RNGS = [
    ("all", 0.0, 1e10),
    ("small", 0.0, 32.0 ** 2),
    ("medium", 32.0 ** 2, 96.0 ** 2),
    ("large", 96.0 ** 2, 1e10),
]
MAX_DETS = (1, 10, 100)


def _iou_xywh(d, g, crowd):
    d = np.asarray(d, np.float64).reshape(-1, 4)
    g = np.asarray(g, np.float64).reshape(-1, 4)
    out = np.zeros((len(d), len(g)))
    for i, db in enumerate(d):
        for j, gb in enumerate(g):
            ix = max(0.0, min(db[0] + db[2], gb[0] + gb[2])
                     - max(db[0], gb[0]))
            iy = max(0.0, min(db[1] + db[3], gb[1] + gb[3])
                     - max(db[1], gb[1]))
            inter = ix * iy
            da = db[2] * db[3]
            ga = gb[2] * gb[3]
            union = da if crowd[j] else da + ga - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


class PycocoMirror:
    """Naive transcription of pycocotools.COCOeval (bbox flavor)."""

    def __init__(self, gt_by_image, cat_ids, image_ids):
        self.gt = gt_by_image
        self.cat_ids = list(cat_ids)
        self.image_ids = list(image_ids)

    def evaluate_img(self, img_id, cat_id, arng, max_det, dts):
        gts = [g for g in self.gt.get(img_id, [])
               if g["category_id"] == cat_id]
        dt = [d for d in dts if d["category_id"] == cat_id]
        if len(gts) == 0 and len(dt) == 0:
            return None
        for g in gts:
            # pycocotools _prepare: crowd GTs are always ignored for
            # the detection task (gt['ignore'] |= gt['iscrowd'])
            g["_ignore"] = 1 if (
                g.get("ignore", 0) or g["iscrowd"]
                or g["area"] < arng[0] or g["area"] > arng[1]
            ) else 0
        # sort gt: non-ignored first, stable
        gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
        gts = [gts[i] for i in gtind]
        # sort dt by -score, stable; truncate to maxDet
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:max_det]]
        iscrowd = [int(g["iscrowd"]) for g in gts]
        ious = _iou_xywh(
            [d["bbox"] for d in dt], [g["bbox"] for g in gts], iscrowd
        )

        T = len(IOU_THRS)
        G = len(gts)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gt_ig = np.array([g["_ignore"] for g in gts])
        dt_ig = np.zeros((T, D))
        for t, t0 in enumerate(IOU_THRS):
            for dind in range(D):
                iou = min(t0, 1 - 1e-10)
                m = -1
                for gind in range(G):
                    if gtm[t, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[t, dind] = gt_ig[m]
                dtm[t, dind] = 1 + m
                gtm[t, m] = 1 + dind
        a = np.array([
            d["area"] < arng[0] or d["area"] > arng[1] for d in dt
        ]).reshape(1, D)
        dt_ig = np.logical_or(
            dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0))
        )
        return dict(
            dtm=dtm, dt_ig=dt_ig, gt_ig=gt_ig,
            scores=np.array([d["score"] for d in dt]),
        )

    def accumulate(self, detections):
        """detections: img_id -> list of det dicts (bbox xywh, score,
        category_id, area). Returns (precision, recall) arrays."""
        T, R = len(IOU_THRS), len(REC_THRS)
        K, A, M = len(self.cat_ids), len(AREA_RNGS), len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        for k, cat in enumerate(self.cat_ids):
            for a, (_, lo, hi) in enumerate(AREA_RNGS):
                for m, max_det in enumerate(MAX_DETS):
                    evals = [
                        self.evaluate_img(
                            img, cat, (lo, hi), max_det,
                            detections.get(img, []),
                        )
                        for img in self.image_ids
                    ]
                    evals = [e for e in evals if e is not None]
                    if not evals:
                        continue
                    scores = np.concatenate([e["scores"] for e in evals])
                    inds = np.argsort(-scores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtm"] for e in evals], axis=1)[:, inds]
                    dt_ig = np.concatenate(
                        [e["dt_ig"] for e in evals], axis=1)[:, inds]
                    gt_ig = np.concatenate([e["gt_ig"] for e in evals])
                    npig = int((gt_ig == 0).sum())
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm > 0, ~dt_ig.astype(bool))
                    fps = np.logical_and(dtm == 0, ~dt_ig.astype(bool))
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for t in range(T):
                        tp = tp_sum[t]
                        fp = fp_sum[t]
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        q = np.zeros(R)
                        inds_r = np.searchsorted(rc, REC_THRS, side="left")
                        for ri, pi in enumerate(inds_r):
                            if pi < nd:
                                q[ri] = pr[pi]
                        precision[t, :, k, a, m] = q
        return precision, recall

    def summarize(self, detections):
        precision, recall = self.accumulate(detections)

        def _ap(t=None, a=0, m=2):
            s = precision[:, :, :, a, m] if t is None else \
                precision[[t], :, :, a, m]
            s = s[s > -1]
            return float(s.mean()) if s.size else -1.0

        def _ar(a=0, m=2):
            s = recall[:, :, a, m]
            s = s[s > -1]
            return float(s.mean()) if s.size else -1.0

        return {
            "AP": _ap(), "AP50": _ap(t=0), "AP75": _ap(t=5),
            "APs": _ap(a=1), "APm": _ap(a=2), "APl": _ap(a=3),
            "AR1": _ar(m=0), "AR10": _ar(m=1), "AR100": _ar(m=2),
            "ARs": _ar(a=1, m=2), "ARm": _ar(a=2, m=2),
            "ARl": _ar(a=3, m=2),
        }


# ---------------------------------------------------------------------------


def run_both(gt_by_image, detections, cat_ids, image_ids):
    mirror = PycocoMirror(
        {k: [dict(g) for g in v] for k, v in gt_by_image.items()},
        cat_ids, image_ids,
    ).summarize(detections)

    ours_det = {}
    for img in image_ids:
        dts = detections.get(img, [])
        ours_det[img] = dict(
            boxes_xywh=np.asarray(
                [d["bbox"] for d in dts], np.float64
            ).reshape(-1, 4),
            scores=np.asarray([d["score"] for d in dts], np.float64),
            category_ids=np.asarray(
                [d["category_id"] for d in dts], np.int64),
        )
    ours = COCOEvaluator(gt_by_image, cat_ids, image_ids).evaluate(ours_det)
    return mirror, ours


def assert_match(mirror, ours):
    for k, v in mirror.items():
        np.testing.assert_allclose(
            ours[k], v, atol=1e-9, err_msg=f"metric {k}")


def _gt(img, cat, bbox, crowd=0, ignore=0):
    return dict(bbox=list(map(float, bbox)), category_id=cat,
                iscrowd=crowd, area=float(bbox[2] * bbox[3]),
                ignore=ignore)


def _dt(img, cat, bbox, score):
    return dict(bbox=list(map(float, bbox)), category_id=cat,
                score=float(score), area=float(bbox[2] * bbox[3]),
                image_id=img)


def test_score_ties_stable_order():
    """Equal scores within and across images: pycocotools' stable
    mergesort keeps original (per-image, then concat) order, which
    changes which det is 'first' and therefore matches."""
    gt = {1: [_gt(1, 1, (0, 0, 10, 10))], 2: [_gt(2, 1, (0, 0, 10, 10))]}
    det = {
        1: [
            _dt(1, 1, (1, 1, 10, 10), 0.5),   # overlaps but not first?
            _dt(1, 1, (0, 0, 10, 10), 0.5),   # exact match, same score
        ],
        2: [
            _dt(2, 1, (0, 0, 10, 10), 0.5),
            _dt(2, 1, (20, 20, 5, 5), 0.5),   # pure FP, same score
        ],
    }
    assert_match(*run_both(gt, det, [1], [1, 2]))


def test_unmatched_out_of_area_range_det_is_ignored_not_fp():
    """A large unmatched det evaluated under the 'small' area range must
    be IGNORED (not counted FP) — the dtIg |= (dtm==0 & out-of-range)
    line of evaluateImg."""
    gt = {1: [_gt(1, 1, (0, 0, 20, 20))]}  # small gt (400 px)
    det = {1: [
        _dt(1, 1, (50, 50, 200, 200), 0.95),  # large FP, HIGHEST score
        _dt(1, 1, (0, 0, 20, 20), 0.9),       # TP small
    ]}
    mirror, ours = run_both(gt, det, [1], [1])
    assert_match(mirror, ours)
    # sanity on the semantics itself: APs must be 1.0 (the large FP is
    # ignored in the small range), while AP-all sees the leading FP
    # drop precision at every recall point to 1/2
    np.testing.assert_allclose(mirror["APs"], 1.0)
    assert mirror["AP"] < 1.0


def test_crowd_gt_many_to_one():
    """Crowd GT: several dets may match the same crowd (gtm skip only
    applies to non-crowd), IoU uses inter/dt_area, and crowd matches are
    ignored (not TP/FP)."""
    gt = {1: [
        _gt(1, 1, (0, 0, 100, 100), crowd=1),
        _gt(1, 1, (200, 0, 10, 10)),
    ]}
    det = {1: [
        _dt(1, 1, (10, 10, 20, 20), 0.9),   # inside crowd
        _dt(1, 1, (40, 40, 20, 20), 0.8),   # also inside crowd
        _dt(1, 1, (200, 0, 10, 10), 0.7),   # TP on the real gt
    ]}
    mirror, ours = run_both(gt, det, [1], [1])
    assert_match(mirror, ours)
    np.testing.assert_allclose(mirror["AP"], 1.0)  # crowd matches ignored, real gt found


def test_crowd_preference_rule():
    """A det overlapping BOTH a real gt (above threshold) and a crowd:
    the loop order prefers the best-IoU non-ignored gt; the crowd can
    only claim it if its IoU is higher (crowds sort after non-ignored
    only when ignored — a NON-ignored crowd keeps list order)."""
    gt = {1: [
        _gt(1, 1, (0, 0, 30, 30)),
        _gt(1, 1, (0, 0, 100, 100), crowd=1),
    ]}
    det = {1: [_dt(1, 1, (0, 0, 28, 30), 0.9)]}
    assert_match(*run_both(gt, det, [1], [1]))


def test_maxdets_truncation_before_matching():
    """maxDets=1: only the single highest-score det per image enters
    matching at all — a lower-scored exact match must NOT rescue AR1."""
    gt = {1: [_gt(1, 1, (0, 0, 10, 10))]}
    det = {1: [
        _dt(1, 1, (50, 50, 10, 10), 0.9),  # best score, misses
        _dt(1, 1, (0, 0, 10, 10), 0.8),    # exact, but truncated at M=1
    ]}
    mirror, ours = run_both(gt, det, [1], [1])
    assert_match(mirror, ours)
    np.testing.assert_allclose(mirror["AR1"], 0.0)
    np.testing.assert_allclose(mirror["AR10"], 1.0)


def test_ignored_gt_tail_break_rule():
    """Once a det has a non-ignored candidate match, the loop BREAKS on
    reaching the ignored tail — an ignored gt with higher IoU must not
    steal the match."""
    gt = {1: [
        _gt(1, 1, (0, 0, 20, 20)),
        _gt(1, 1, (2, 2, 20, 20), ignore=1),  # higher IoU with the det
    ]}
    det = {1: [_dt(1, 1, (2, 2, 20, 20), 0.9)]}
    mirror, ours = run_both(gt, det, [1], [1])
    assert_match(mirror, ours)
    # IoU with the real gt is ~0.68: a TP at thresholds 0.50-0.65 (the
    # break rule keeps the ignored gt from stealing it); at 0.70+ only
    # the ignored gt qualifies, so the det becomes ignored (recall 0,
    # not FP). AP = 4/10.
    np.testing.assert_allclose(mirror["AP50"], 1.0)
    np.testing.assert_allclose(mirror["AP"], 0.4)


def test_precision_envelope_interpolation():
    """TP/FP interleaving that exercises the right-to-left precision
    envelope and the searchsorted 101-point sampling."""
    gt = {1: [_gt(1, 1, (i * 30, 0, 10, 10)) for i in range(4)]}
    det = {1: [
        _dt(1, 1, (0, 0, 10, 10), 0.95),     # TP
        _dt(1, 1, (200, 200, 10, 10), 0.9),  # FP
        _dt(1, 1, (30, 0, 10, 10), 0.85),    # TP
        _dt(1, 1, (210, 200, 10, 10), 0.8),  # FP
        _dt(1, 1, (60, 0, 10, 10), 0.75),    # TP
        _dt(1, 1, (90, 0, 10, 10), 0.7),     # TP
    ]}
    assert_match(*run_both(gt, det, [1], [1]))


def test_iou_boundary_inclusive():
    """Matching requires iou >= threshold via the min(t, 1-1e-10) seed:
    an exact-0.5-IoU det must match at the 0.5 threshold."""
    # xywh (0,0,10,20) vs (0,0,10,10): inter 100, union 200 -> 0.5
    gt = {1: [_gt(1, 1, (0, 0, 10, 10))]}
    det = {1: [_dt(1, 1, (0, 0, 10, 20), 0.9)]}
    mirror, ours = run_both(gt, det, [1], [1])
    assert_match(mirror, ours)
    np.testing.assert_allclose(mirror["AP50"], 1.0)


def test_multiclass_and_missing_images():
    gt = {
        1: [_gt(1, 1, (0, 0, 10, 10)), _gt(1, 2, (50, 50, 40, 40))],
        2: [_gt(2, 2, (0, 0, 120, 120))],
        3: [],  # no gt at all
    }
    det = {
        1: [_dt(1, 1, (0, 0, 10, 10), 0.9),
            _dt(1, 2, (52, 50, 40, 40), 0.8)],
        2: [_dt(2, 2, (0, 0, 110, 120), 0.7),
            _dt(2, 1, (0, 0, 10, 10), 0.6)],  # wrong class FP
        3: [_dt(3, 1, (5, 5, 10, 10), 0.5)],
    }
    assert_match(*run_both(gt, det, [1, 2], [1, 2, 3]))


def test_randomized_fuzz():
    """200 random dets / 60 random gts over 6 images, 3 classes, crowds
    and ignores mixed in — full-metric agreement with the mirror."""
    rng = np.random.RandomState(0)
    image_ids = [1, 2, 3, 4, 5, 6]
    cat_ids = [1, 2, 3]
    gt = {}
    for img in image_ids:
        anns = []
        for _ in range(10):
            w, h = rng.uniform(5, 120, 2)
            x, y = rng.uniform(0, 300, 2)
            anns.append(_gt(
                img, int(rng.choice(cat_ids)), (x, y, w, h),
                crowd=int(rng.rand() < 0.15),
                ignore=int(rng.rand() < 0.1),
            ))
        gt[img] = anns
    det = {}
    for img in image_ids:
        dts = []
        for _ in range(33):
            if rng.rand() < 0.6 and gt[img]:
                src = gt[img][rng.randint(len(gt[img]))]["bbox"]
                jitter = rng.normal(0, 4, 4)
                bbox = (src[0] + jitter[0], src[1] + jitter[1],
                        max(3.0, src[2] + jitter[2]),
                        max(3.0, src[3] + jitter[3]))
            else:
                w, h = rng.uniform(5, 120, 2)
                x, y = rng.uniform(0, 300, 2)
                bbox = (x, y, w, h)
            # quantized scores force plenty of exact ties
            score = round(float(rng.uniform(0.05, 1.0)), 2)
            dts.append(_dt(img, int(rng.choice(cat_ids)), bbox, score))
        det[img] = dts
    assert_match(*run_both(gt, det, cat_ids, image_ids))
