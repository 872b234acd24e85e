"""Train-path parity vs the ACTUAL reference torch losses.

The crown-jewel check VERDICT r2 asked for: run the reference's own
``PAALossComputation.__call__`` (paa_core/modeling/rpn/paa/loss.py:267-359,
sklearn GMM and all) on a synthetic batch and assert our fully-vectorized
on-device loss produces the IDENTICAL positive-anchor assignment and the
same loss values to tight tolerance. Unlike tests/test_paa_loss.py (which
compares against a numpy mirror the builder wrote), this one executes the
reference code itself, so a shared misreading cannot hide.

Covers: multi-candidate GTs, single-candidate GTs (tiny boxes matched via
the low-quality-tie rule, loss.py:218-221), USE_IOU_PRED on/off, several
seeds. Zero-GT images are excluded because the reference's Matcher raises
on empty GT (matcher.py:55-59) — the reference cannot run them; our
zero-GT handling is covered in test_paa_loss.py.

Robustness note: a 30-seed fuzz of this harness matched the reference
assignment EXACTLY on 29 seeds; the one exception differed by a single
anchor out of 856 sitting at the GMM fg/bg split point inside a dense
loss continuum — the split lands one sample earlier/later depending on
f32 (ours, on-device) vs f64 (sklearn) EM convergence. That is boundary
noise, not a semantic gap; the pinned seeds below are deterministic.
"""

import unittest

import numpy as np

import jax.numpy as jnp

import ref_torch

# level layout for a 128x160 image, strides 8..128 (loss.py:42)
STRIDES = (8, 16, 32, 64, 128)
SHAPES = ((16, 20), (8, 10), (4, 5), (2, 3), (1, 2))
IMG_W, IMG_H = 160, 128
# bigger layout for ATSS: the reference's per-level topk(9) requires
# >= 9 anchors on EVERY level (atss/loss.py:155) or torch.topk raises
BIG_SHAPES = ((48, 64), (24, 32), (12, 16), (6, 8), (3, 4))
BIG_W, BIG_H = 512, 384


def make_anchors(shapes=SHAPES, strides=STRIDES):
    """Per-level anchor grids, 1 anchor/location of size 8*stride centered
    on the cell (the PAA default layout: defaults.py:296-301). Returns a
    list of (n_l, 4) float32 arrays in level order."""
    out = []
    for stride, (h, w) in zip(strides, shapes):
        size = 8.0 * stride
        ys, xs = np.meshgrid(
            np.arange(h, dtype=np.float32),
            np.arange(w, dtype=np.float32),
            indexing="ij",
        )
        cx = xs * stride + stride / 2.0
        cy = ys * stride + stride / 2.0
        boxes = np.stack(
            [cx - size / 2, cy - size / 2, cx + size / 2, cy + size / 2],
            axis=-1,
        ).reshape(-1, 4)
        out.append(boxes.astype(np.float32))
    return out


def make_locations(shapes=SHAPES, strides=STRIDES):
    """FCOS per-level location grids (fcos.py compute_locations):
    (x*stride + stride//2, y*stride + stride//2)."""
    out = []
    for stride, (h, w) in zip(strides, shapes):
        ys, xs = np.meshgrid(
            np.arange(h, dtype=np.float32),
            np.arange(w, dtype=np.float32),
            indexing="ij",
        )
        pts = np.stack(
            [xs * stride + stride // 2, ys * stride + stride // 2], axis=-1
        ).reshape(-1, 2)
        out.append(pts.astype(np.float32))
    return out


def make_gts(rng, batch, max_gt, include_tiny=True, img_w=IMG_W,
             img_h=IMG_H):
    """Random xyxy GT boxes + labels per image; at least one tiny box per
    image (single-candidate path) when include_tiny."""
    boxes, labels, counts = [], [], []
    for _ in range(batch):
        g = rng.randint(2, max_gt + 1)
        b = []
        for k in range(g):
            if include_tiny and k == 0:
                x1 = rng.uniform(0, img_w - 6)
                y1 = rng.uniform(0, img_h - 6)
                w, h = rng.uniform(2, 5), rng.uniform(2, 5)
            else:
                x1 = rng.uniform(0, img_w * 0.7)
                y1 = rng.uniform(0, img_h * 0.7)
                w = rng.uniform(8, img_w * 0.6)
                h = rng.uniform(8, img_h * 0.6)
            b.append([x1, y1, min(x1 + w, img_w - 1), min(y1 + h, img_h - 1)])
        boxes.append(np.asarray(b, np.float32))
        labels.append(rng.randint(1, 9, size=g).astype(np.int64))
        counts.append(g)
    return boxes, labels, counts


def pad_gts(gt_boxes_np, gt_labels_np, batch):
    g_max = max(len(b) for b in gt_boxes_np)
    gt_boxes = np.zeros((batch, g_max, 4), np.float32)
    gt_labels = np.zeros((batch, g_max), np.int32)
    for i, (b, l) in enumerate(zip(gt_boxes_np, gt_labels_np)):
        gt_boxes[i, : len(b)] = b
        gt_labels[i, : len(l)] = l
    return gt_boxes, gt_labels


def make_ref_boxlists(gt_boxes_np, gt_labels_np, anchors_np, img_w, img_h,
                      with_visibility=False, straddle=0.0):
    """(targets, anchors) in the reference's BoxList format."""
    import torch
    from paa_core.structures.bounding_box import BoxList

    targets, anchors_ref = [], []
    for i in range(len(gt_boxes_np)):
        bl = BoxList(torch.as_tensor(gt_boxes_np[i]), (img_w, img_h),
                     mode="xyxy")
        bl.add_field("labels", torch.as_tensor(gt_labels_np[i]))
        targets.append(bl)
        per_level = []
        for a in anchors_np:
            abl = BoxList(torch.as_tensor(a), (img_w, img_h), mode="xyxy")
            if with_visibility:
                # anchor_generator.py:97-110 add_visibility_to
                vis = (
                    (a[:, 0] >= -straddle) & (a[:, 1] >= -straddle)
                    & (a[:, 2] < img_w + straddle)
                    & (a[:, 3] < img_h + straddle)
                )
                abl.add_field("visibility", torch.as_tensor(vis))
            per_level.append(abl)
        anchors_ref.append(per_level)
    return targets, anchors_ref


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestPAALossParity(unittest.TestCase):
    NUM_CLASSES = 8  # logits channels; labels 1..8 (C is free, loss.py:293)

    @classmethod
    def setUpClass(cls):
        import torch

        cls.torch = torch
        ref_torch.install_shims()
        from paa_core.config import cfg as ref_cfg

        if ref_cfg.is_frozen():
            ref_cfg.defrost()
        ref_cfg.merge_from_file(
            ref_torch.REFERENCE_ROOT + "/configs/paa/paa_R_50_FPN_1x.yaml"
        )
        cls.ref_cfg = ref_cfg
        cls.anchors_np = make_anchors()
        cls.anchors_flat = np.concatenate(cls.anchors_np, axis=0)
        cls.level_counts = tuple(len(a) for a in cls.anchors_np)

    def _ref_loss(self, use_iou_pred):
        """Build the reference loss evaluator with cfg-matched knobs."""
        from paa_core.modeling.rpn.paa.loss import make_paa_loss_evaluator
        from paa_core.modeling.rpn.atss.atss import BoxCoder

        cfg = self.ref_cfg
        evaluator = make_paa_loss_evaluator(cfg, BoxCoder(cfg))
        # reference CPU-path quirk: sigmoid_focal_loss_cpu indexes
        # gamma[0]/alpha[0] (sigmoid_focal_loss.py:42-43) — it was only
        # ever called via the CUDA Function which passes packed args.
        # Wrap the scalars so the reference's own CPU formula runs.
        evaluator.cls_loss_func.gamma = [cfg.MODEL.PAA.LOSS_GAMMA]
        evaluator.cls_loss_func.alpha = [cfg.MODEL.PAA.LOSS_ALPHA]
        return evaluator

    def _our_config(self, use_iou_pred):
        from paa_tpu.modeling.paa_loss import PAALossConfig

        cfg = self.ref_cfg
        return PAALossConfig(
            gamma=cfg.MODEL.PAA.LOSS_GAMMA,
            alpha=cfg.MODEL.PAA.LOSS_ALPHA,
            iou_threshold=cfg.MODEL.PAA.IOU_THRESHOLD,
            topk=cfg.MODEL.PAA.TOPK,
            reg_loss_weight=cfg.MODEL.PAA.REG_LOSS_WEIGHT,
            iou_loss_weight=cfg.MODEL.PAA.IOU_LOSS_WEIGHT,
            use_iou_pred=use_iou_pred,
            gmm_iters=100,  # sklearn max_iter default
        )

    def _run_case(self, seed, batch=2, max_gt=5, use_iou_pred=True,
                  cls_bias=-2.0):
        torch = self.torch
        rng = np.random.RandomState(seed)

        # ---- synthetic head outputs (per-level NCHW) ------------------
        box_cls_t, box_reg_t, iou_pred_t = [], [], []
        for (h, w) in SHAPES:
            box_cls_t.append(torch.as_tensor(
                rng.normal(cls_bias, 1.0, (batch, self.NUM_CLASSES, h, w))
                .astype(np.float32)))
            box_reg_t.append(torch.as_tensor(
                rng.normal(0.0, 0.5, (batch, 4, h, w)).astype(np.float32)))
            iou_pred_t.append(torch.as_tensor(
                rng.normal(0.0, 1.0, (batch, 1, h, w)).astype(np.float32)))

        gt_boxes_np, gt_labels_np, counts = make_gts(rng, batch, max_gt)

        # ---- reference side -------------------------------------------
        from paa_core.structures.bounding_box import BoxList

        targets = []
        anchors_ref = []
        for i in range(batch):
            bl = BoxList(torch.as_tensor(gt_boxes_np[i]), (IMG_W, IMG_H),
                         mode="xyxy")
            bl.add_field("labels", torch.as_tensor(gt_labels_np[i]))
            targets.append(bl)
            anchors_ref.append([
                BoxList(torch.as_tensor(a), (IMG_W, IMG_H), mode="xyxy")
                for a in self.anchors_np
            ])

        evaluator = self._ref_loss(use_iou_pred)
        captured = {}
        orig_compute_paa = evaluator.compute_paa

        def capture(*a, **k):
            labels, reg_targets = orig_compute_paa(*a, **k)
            captured["labels"] = [l.clone() for l in labels]
            return labels, reg_targets

        evaluator.compute_paa = capture
        with torch.no_grad():
            ref_losses = evaluator(
                box_cls_t, box_reg_t,
                iou_pred_t if use_iou_pred else None,
                targets, anchors_ref, None,
            )
        ref_labels = np.stack(
            [l.numpy() for l in captured["labels"]], axis=0
        )  # (B, N)

        # ---- our side --------------------------------------------------
        from paa_tpu.modeling.paa_loss import paa_loss

        def flatten(ts, c):
            return np.concatenate(
                [ref_torch.permute_and_flatten(t, 1, c) for t in ts], axis=1
            )

        outputs = {
            "cls_logits": jnp.asarray(flatten(box_cls_t, self.NUM_CLASSES)),
            "box_regression": jnp.asarray(flatten(box_reg_t, 4)),
        }
        if use_iou_pred:
            outputs["iou_pred"] = jnp.asarray(
                flatten(iou_pred_t, 1)[..., 0])

        g_max = max(counts)
        gt_boxes = np.zeros((batch, g_max, 4), np.float32)
        gt_labels = np.zeros((batch, g_max), np.int32)
        for i, (b, l) in enumerate(zip(gt_boxes_np, gt_labels_np)):
            gt_boxes[i, : len(b)] = b
            gt_labels[i, : len(l)] = l

        out, aux = paa_loss(
            outputs, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(self.anchors_flat), self.level_counts,
            self._our_config(use_iou_pred), num_shards=1, return_aux=True,
        )
        return ref_losses, ref_labels, out, aux

    def _assert_parity(self, ref_losses, ref_labels, out, aux,
                       use_iou_pred=True, rtol=1e-4):
        ours_labels = np.asarray(aux["labels_paa"])
        np.testing.assert_array_equal(
            ours_labels, ref_labels,
            err_msg="PAA positive-anchor assignment differs from reference",
        )
        self.assertEqual(int(np.asarray(out["num_pos"])),
                         int((ref_labels > 0).sum()))
        np.testing.assert_allclose(
            float(out["loss_cls"]), float(ref_losses[0]), rtol=rtol)
        np.testing.assert_allclose(
            float(out["loss_reg"]), float(ref_losses[1]), rtol=rtol)
        if use_iou_pred:
            np.testing.assert_allclose(
                float(out["loss_iou_pred"]), float(ref_losses[2]), rtol=rtol)

    def test_seed0(self):
        self._assert_parity(*self._run_case(0))

    def test_seed1(self):
        self._assert_parity(*self._run_case(1))

    def test_seed2_more_gts(self):
        self._assert_parity(*self._run_case(2, batch=2, max_gt=8))

    def test_seed3_dense_cls(self):
        # higher cls bias -> bigger focal losses, different GMM landscape
        self._assert_parity(*self._run_case(3, cls_bias=-0.5))

    def test_no_iou_pred(self):
        """USE_IOU_PRED=False: reg normalized by num_pos (loss.py:354)."""
        ref_losses, ref_labels, out, aux = self._run_case(
            4, use_iou_pred=False)
        self._assert_parity(ref_losses, ref_labels, out, aux,
                            use_iou_pred=False)

    def test_single_candidate_gts_present(self):
        """The tiny first GT of each image must exercise the
        single-candidate path (is_pos=0, loss.py:218-221): verify such a
        GT exists AND assignment still matches."""
        ref_losses, ref_labels, out, aux = self._run_case(5)
        # each image's GT 0 is tiny: it should have contributed exactly
        # one positive anchor somewhere (recovered low-quality match)
        self.assertGreater(int((ref_labels > 0).sum()), 0)
        self._assert_parity(ref_losses, ref_labels, out, aux)

    def _run_grads(self, seed, use_iou_pred=True):
        """GRADIENT parity: d(total loss)/d(head outputs) must match the
        reference's autograd. Value parity alone can hide detach
        mismatches — e.g. the reference computes the GIoU reg weights
        from the PREDICTED boxes with gradients flowing (loss.py:
        328-356) and detaches only the GMM scoring (loss.py:292-306);
        a stray stop_gradient on our side would pass every value test
        and still train differently."""
        import jax

        torch = self.torch
        rng = np.random.RandomState(seed)

        box_cls_t, box_reg_t, iou_pred_t = [], [], []
        for (h, w) in SHAPES:
            box_cls_t.append(torch.as_tensor(
                rng.normal(-2.0, 1.0, (2, self.NUM_CLASSES, h, w))
                .astype(np.float32)).requires_grad_(True))
            box_reg_t.append(torch.as_tensor(
                rng.normal(0.0, 0.5, (2, 4, h, w)).astype(np.float32))
                .requires_grad_(True))
            iou_pred_t.append(torch.as_tensor(
                rng.normal(0.0, 1.0, (2, 1, h, w)).astype(np.float32))
                .requires_grad_(True))

        gt_boxes_np, gt_labels_np, _ = make_gts(rng, 2, 5)
        targets, anchors_ref = make_ref_boxlists(
            gt_boxes_np, gt_labels_np, self.anchors_np, IMG_W, IMG_H)

        evaluator = self._ref_loss(use_iou_pred)
        ref_losses = evaluator(
            box_cls_t, box_reg_t,
            iou_pred_t if use_iou_pred else None,
            targets, anchors_ref, None,
        )
        total = ref_losses[0] + ref_losses[1]
        if use_iou_pred:
            total = total + ref_losses[2]
        total.backward()

        def flatten(ts, c, grad=False):
            return np.concatenate(
                [
                    ref_torch.permute_and_flatten(
                        t.grad if grad else t, 1, c
                    )
                    for t in ts
                ],
                axis=1,
            )

        outputs = {
            "cls_logits": jnp.asarray(
                flatten(box_cls_t, self.NUM_CLASSES)),
            "box_regression": jnp.asarray(flatten(box_reg_t, 4)),
        }
        if use_iou_pred:
            outputs["iou_pred"] = jnp.asarray(
                flatten(iou_pred_t, 1)[..., 0])

        gt_boxes, gt_labels = pad_gts(gt_boxes_np, gt_labels_np, 2)
        from paa_tpu.modeling.paa_loss import paa_loss

        def total_fn(out_dict):
            losses = paa_loss(
                out_dict, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                jnp.asarray(self.anchors_flat), self.level_counts,
                self._our_config(use_iou_pred), num_shards=1,
            )
            t = losses["loss_cls"] + losses["loss_reg"]
            if use_iou_pred:
                t = t + losses["loss_iou_pred"]
            return t

        grads = jax.grad(total_fn)(outputs)

        np.testing.assert_allclose(
            np.asarray(grads["cls_logits"]),
            flatten(box_cls_t, self.NUM_CLASSES, grad=True),
            rtol=1e-3, atol=1e-8, err_msg="d/d cls_logits",
        )
        np.testing.assert_allclose(
            np.asarray(grads["box_regression"]),
            flatten(box_reg_t, 4, grad=True),
            rtol=1e-3, atol=1e-8, err_msg="d/d box_regression",
        )
        if use_iou_pred:
            np.testing.assert_allclose(
                np.asarray(grads["iou_pred"]),
                flatten(iou_pred_t, 1, grad=True)[..., 0],
                rtol=1e-3, atol=1e-8, err_msg="d/d iou_pred",
            )

    def test_gradients_seed0(self):
        self._run_grads(10)

    def test_gradients_no_iou_pred(self):
        self._run_grads(11, use_iou_pred=False)


def _flat_t(ts, c, grad=False):
    """Per-level torch NCHW tensors (or their grads) -> (B, N, C)."""
    return np.concatenate(
        [
            ref_torch.permute_and_flatten(t.grad if grad else t, 1, c)
            for t in ts
        ],
        axis=1,
    )


def _shim_focal(loss_evaluator, gamma, alpha):
    """Work around the reference CPU focal-loss quirk (gamma[0]/alpha[0]
    indexing in sigmoid_focal_loss.py:42-43)."""
    loss_evaluator.cls_loss_func.gamma = [gamma]
    loss_evaluator.cls_loss_func.alpha = [alpha]


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestATSSLossParity(unittest.TestCase):
    """Our atss_loss vs the reference ATSSLossComputation
    (atss/loss.py:27-276) for all three POSITIVE_TYPEs."""

    NUM_CLASSES = 8

    @classmethod
    def setUpClass(cls):
        import torch

        cls.torch = torch
        ref_torch.install_shims()
        from paa_core.config import cfg as ref_cfg

        if ref_cfg.is_frozen():
            ref_cfg.defrost()
        ref_cfg.merge_from_file(
            ref_torch.REFERENCE_ROOT + "/configs/atss/atss_R_50_FPN_1x.yaml"
        )
        cls.ref_cfg = ref_cfg
        cls.anchors_np = make_anchors(BIG_SHAPES, STRIDES)
        cls.anchors_flat = np.concatenate(cls.anchors_np, axis=0)
        cls.level_counts = tuple(len(a) for a in cls.anchors_np)

    def _run_case(self, seed, positive_type, batch=2, max_gt=4):
        torch = self.torch
        cfg = self.ref_cfg
        if cfg.is_frozen():
            cfg.defrost()
        cfg.MODEL.ATSS.POSITIVE_TYPE = positive_type
        rng = np.random.RandomState(seed)

        box_cls_t, box_reg_t, ctr_t = [], [], []
        for (h, w) in BIG_SHAPES:
            box_cls_t.append(torch.as_tensor(
                rng.normal(-2.0, 1.0, (batch, self.NUM_CLASSES, h, w))
                .astype(np.float32)))
            box_reg_t.append(torch.as_tensor(
                rng.normal(0.0, 0.5, (batch, 4, h, w)).astype(np.float32)))
            ctr_t.append(torch.as_tensor(
                rng.normal(0.0, 1.0, (batch, 1, h, w)).astype(np.float32)))

        gt_boxes_np, gt_labels_np, _ = make_gts(
            rng, batch, max_gt, include_tiny=(positive_type == "IoU"),
            img_w=BIG_W, img_h=BIG_H,
        )
        targets, anchors_ref = make_ref_boxlists(
            gt_boxes_np, gt_labels_np, self.anchors_np, BIG_W, BIG_H)

        from paa_core.modeling.rpn.atss.loss import make_atss_loss_evaluator
        from paa_core.modeling.rpn.atss.atss import BoxCoder

        evaluator = make_atss_loss_evaluator(cfg, BoxCoder(cfg))
        _shim_focal(evaluator, cfg.MODEL.ATSS.LOSS_GAMMA,
                    cfg.MODEL.ATSS.LOSS_ALPHA)
        captured = {}
        orig = evaluator.prepare_targets

        def capture(*a, **k):
            labels, reg_targets = orig(*a, **k)
            captured["labels"] = [l.clone() for l in labels]
            return labels, reg_targets

        evaluator.prepare_targets = capture
        with torch.no_grad():
            ref_losses = evaluator(
                box_cls_t, box_reg_t, ctr_t, targets, anchors_ref)
        ref_labels = np.stack(
            [l.numpy() for l in captured["labels"]], axis=0)

        # ---- ours ------------------------------------------------------
        from paa_tpu.modeling.atss_loss import ATSSLossConfig, atss_loss

        def flatten(ts, c):
            return np.concatenate(
                [ref_torch.permute_and_flatten(t, 1, c) for t in ts], axis=1)

        outputs = {
            "cls_logits": jnp.asarray(flatten(box_cls_t, self.NUM_CLASSES)),
            "box_regression": jnp.asarray(flatten(box_reg_t, 4)),
            "iou_pred": jnp.asarray(flatten(ctr_t, 1)[..., 0]),
        }
        gt_boxes, gt_labels = pad_gts(gt_boxes_np, gt_labels_np, batch)
        lc = ATSSLossConfig(
            gamma=cfg.MODEL.ATSS.LOSS_GAMMA,
            alpha=cfg.MODEL.ATSS.LOSS_ALPHA,
            topk=cfg.MODEL.ATSS.TOPK,
            fg_iou_threshold=cfg.MODEL.ATSS.FG_IOU_THRESHOLD,
            bg_iou_threshold=cfg.MODEL.ATSS.BG_IOU_THRESHOLD,
            reg_loss_weight=cfg.MODEL.ATSS.REG_LOSS_WEIGHT,
            positive_type=positive_type,
            use_iou_pred=False,
        )
        out = atss_loss(
            outputs, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(self.anchors_flat), self.level_counts, lc)

        # our per-anchor labels via the same assign functions
        from paa_tpu.modeling import atss_loss as mod

        if positive_type == "ATSS":
            labels, _ = mod.atss_assign(
                jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                jnp.asarray(self.anchors_flat), self.level_counts, lc.topk)
        elif positive_type == "SSC":
            labels, _ = mod.ssc_assign(
                jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                jnp.asarray(self.anchors_flat), self.level_counts)
        else:
            labels, _ = mod.iou_assign(
                jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                jnp.asarray(self.anchors_flat),
                lc.fg_iou_threshold, lc.bg_iou_threshold)
        return ref_losses, ref_labels, out, np.asarray(labels)

    def _assert_parity(self, ref_losses, ref_labels, out, our_labels,
                       rtol=1e-4):
        np.testing.assert_array_equal(our_labels, ref_labels)
        np.testing.assert_allclose(
            float(out["loss_cls"]), float(ref_losses[0]), rtol=rtol)
        np.testing.assert_allclose(
            float(out["loss_reg"]), float(ref_losses[1]), rtol=rtol)
        np.testing.assert_allclose(
            float(out["loss_centerness"]), float(ref_losses[2]), rtol=rtol)

    def test_gradients_atss_mode(self):
        """d(total)/d(head outputs) vs reference autograd (the ATSS
        assignment is score-independent, so only the loss formulas and
        the centerness-weighted GIoU normalization carry gradients)."""
        import jax

        torch = self.torch
        cfg = self.ref_cfg
        if cfg.is_frozen():
            cfg.defrost()
        cfg.MODEL.ATSS.POSITIVE_TYPE = "ATSS"
        rng = np.random.RandomState(19)

        box_cls_t, box_reg_t, ctr_t = [], [], []
        for (h, w) in BIG_SHAPES:
            box_cls_t.append(torch.as_tensor(
                rng.normal(-2.0, 1.0, (2, self.NUM_CLASSES, h, w))
                .astype(np.float32)).requires_grad_(True))
            box_reg_t.append(torch.as_tensor(
                rng.normal(0.0, 0.5, (2, 4, h, w)).astype(np.float32))
                .requires_grad_(True))
            ctr_t.append(torch.as_tensor(
                rng.normal(0.0, 1.0, (2, 1, h, w)).astype(np.float32))
                .requires_grad_(True))
        gt_boxes_np, gt_labels_np, _ = make_gts(
            rng, 2, 4, include_tiny=False, img_w=BIG_W, img_h=BIG_H)
        targets, anchors_ref = make_ref_boxlists(
            gt_boxes_np, gt_labels_np, self.anchors_np, BIG_W, BIG_H)

        from paa_core.modeling.rpn.atss.loss import (
            make_atss_loss_evaluator)
        from paa_core.modeling.rpn.atss.atss import BoxCoder

        evaluator = make_atss_loss_evaluator(cfg, BoxCoder(cfg))
        _shim_focal(evaluator, cfg.MODEL.ATSS.LOSS_GAMMA,
                    cfg.MODEL.ATSS.LOSS_ALPHA)
        ref_losses = evaluator(
            box_cls_t, box_reg_t, ctr_t, targets, anchors_ref)
        (ref_losses[0] + ref_losses[1] + ref_losses[2]).backward()

        from paa_tpu.modeling.atss_loss import ATSSLossConfig, atss_loss

        outputs = {
            "cls_logits": jnp.asarray(_flat_t(box_cls_t,
                                              self.NUM_CLASSES)),
            "box_regression": jnp.asarray(_flat_t(box_reg_t, 4)),
            "iou_pred": jnp.asarray(_flat_t(ctr_t, 1)[..., 0]),
        }
        gt_boxes, gt_labels = pad_gts(gt_boxes_np, gt_labels_np, 2)
        lc = ATSSLossConfig(
            gamma=cfg.MODEL.ATSS.LOSS_GAMMA,
            alpha=cfg.MODEL.ATSS.LOSS_ALPHA,
            topk=cfg.MODEL.ATSS.TOPK,
            fg_iou_threshold=cfg.MODEL.ATSS.FG_IOU_THRESHOLD,
            bg_iou_threshold=cfg.MODEL.ATSS.BG_IOU_THRESHOLD,
            reg_loss_weight=cfg.MODEL.ATSS.REG_LOSS_WEIGHT,
            positive_type="ATSS",
            use_iou_pred=False,
        )

        def total_fn(out_dict):
            losses = atss_loss(
                out_dict, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                jnp.asarray(self.anchors_flat), self.level_counts, lc)
            return (losses["loss_cls"] + losses["loss_reg"]
                    + losses["loss_centerness"])

        grads = jax.grad(total_fn)(outputs)
        np.testing.assert_allclose(
            np.asarray(grads["cls_logits"]),
            _flat_t(box_cls_t, self.NUM_CLASSES, grad=True),
            rtol=1e-3, atol=1e-8, err_msg="d/d cls_logits")
        np.testing.assert_allclose(
            np.asarray(grads["box_regression"]),
            _flat_t(box_reg_t, 4, grad=True),
            rtol=1e-3, atol=1e-8, err_msg="d/d box_regression")
        np.testing.assert_allclose(
            np.asarray(grads["iou_pred"]),
            _flat_t(ctr_t, 1, grad=True)[..., 0],
            rtol=1e-3, atol=1e-8, err_msg="d/d centerness")

    def test_atss_mode(self):
        self._assert_parity(*self._run_case(10, "ATSS"))

    def test_atss_mode_seed2(self):
        self._assert_parity(*self._run_case(11, "ATSS", max_gt=7))

    def test_ssc_mode(self):
        self._assert_parity(*self._run_case(12, "SSC"))

    def test_iou_mode(self):
        self._assert_parity(*self._run_case(13, "IoU"))


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestFCOSLossParity(unittest.TestCase):
    """Our fcos_loss vs the reference FCOSLossComputation
    (fcos/loss.py:35-280), with and without center sampling."""

    NUM_CLASSES = 8

    @classmethod
    def setUpClass(cls):
        import torch

        cls.torch = torch
        ref_torch.install_shims()
        from paa_core.config import cfg as ref_cfg

        if ref_cfg.is_frozen():
            ref_cfg.defrost()
        cls.ref_cfg = ref_cfg
        cls.locations_np = make_locations(SHAPES, STRIDES)
        cls.level_counts = tuple(len(p) for p in cls.locations_np)

    def _run_case(self, seed, center_radius=0.0, iou_loss_type="iou",
                  norm_reg_targets=False, batch=2, max_gt=4):
        torch = self.torch
        cfg = self.ref_cfg
        if cfg.is_frozen():
            cfg.defrost()
        cfg.MODEL.FCOS.CENTER_SAMPLING_RADIUS = center_radius
        cfg.MODEL.FCOS.IOU_LOSS_TYPE = iou_loss_type
        cfg.MODEL.FCOS.NORM_REG_TARGETS = norm_reg_targets
        rng = np.random.RandomState(seed)

        box_cls_t, box_reg_t, ctr_t = [], [], []
        for (h, w) in SHAPES:
            box_cls_t.append(torch.as_tensor(
                rng.normal(-2.0, 1.0, (batch, self.NUM_CLASSES, h, w))
                .astype(np.float32)))
            # positive l/t/r/b predictions (post relu/exp in the real head)
            box_reg_t.append(torch.as_tensor(
                rng.uniform(1.0, 64.0, (batch, 4, h, w)).astype(np.float32)))
            ctr_t.append(torch.as_tensor(
                rng.normal(0.0, 1.0, (batch, 1, h, w)).astype(np.float32)))

        gt_boxes_np, gt_labels_np, _ = make_gts(
            rng, batch, max_gt, include_tiny=False)
        targets, _ = make_ref_boxlists(
            gt_boxes_np, gt_labels_np, [], IMG_W, IMG_H)
        locations_t = [torch.as_tensor(p) for p in self.locations_np]

        from paa_core.modeling.rpn.fcos.loss import make_fcos_loss_evaluator

        evaluator = make_fcos_loss_evaluator(cfg)
        _shim_focal(evaluator, cfg.MODEL.FCOS.LOSS_GAMMA,
                    cfg.MODEL.FCOS.LOSS_ALPHA)
        captured = {}
        orig = evaluator.prepare_targets

        def capture(points, tg):
            labels_lf, reg_lf = orig(points, tg)
            captured["labels_lf"] = [l.clone() for l in labels_lf]
            return labels_lf, reg_lf

        evaluator.prepare_targets = capture
        with torch.no_grad():
            ref_losses = evaluator(
                locations_t, box_cls_t, box_reg_t, ctr_t, targets)

        # level-first (B*n_l,) per level -> (B, N) anchor-order labels
        ref_labels = np.zeros(
            (batch, sum(self.level_counts)), dtype=np.int64)
        start = 0
        for l, n_l in enumerate(self.level_counts):
            lf = captured["labels_lf"][l].numpy()  # (B*n_l,)
            for b in range(batch):
                ref_labels[b, start:start + n_l] = lf[b * n_l:(b + 1) * n_l]
            start += n_l

        # ---- ours ------------------------------------------------------
        from paa_tpu.modeling.fcos_loss import (
            FCOSLossConfig, fcos_assign, fcos_loss)

        def flatten(ts, c):
            return np.concatenate(
                [ref_torch.permute_and_flatten(t, 1, c) for t in ts], axis=1)

        outputs = {
            "cls_logits": jnp.asarray(flatten(box_cls_t, self.NUM_CLASSES)),
            "box_regression": jnp.asarray(flatten(box_reg_t, 4)),
            "iou_pred": jnp.asarray(flatten(ctr_t, 1)[..., 0]),
        }
        gt_boxes, gt_labels = pad_gts(gt_boxes_np, gt_labels_np, batch)
        lc = FCOSLossConfig(
            gamma=cfg.MODEL.FCOS.LOSS_GAMMA,
            alpha=cfg.MODEL.FCOS.LOSS_ALPHA,
            strides=STRIDES,
            center_sampling_radius=center_radius,
            iou_loss_type=iou_loss_type,
            norm_reg_targets=norm_reg_targets,
        )
        loc_flat = np.concatenate(self.locations_np, axis=0)
        loc_xyxy = np.concatenate([loc_flat, loc_flat], axis=1)
        out = fcos_loss(
            outputs, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(loc_xyxy), self.level_counts, lc)
        labels, _ = fcos_assign(
            jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(loc_flat), self.level_counts, lc)
        return ref_losses, ref_labels, out, np.asarray(labels)

    def _assert_parity(self, ref_losses, ref_labels, out, our_labels,
                       rtol=1e-4):
        np.testing.assert_array_equal(our_labels, ref_labels)
        np.testing.assert_allclose(
            float(out["loss_cls"]), float(ref_losses[0]), rtol=rtol)
        np.testing.assert_allclose(
            float(out["loss_reg"]), float(ref_losses[1]), rtol=rtol)
        np.testing.assert_allclose(
            float(out["loss_centerness"]), float(ref_losses[2]), rtol=rtol)

    def test_gradients_plain(self):
        """d(total)/d(head outputs) vs reference autograd — pins the
        IOULoss backward (area-ratio quotient rule) and the
        centerness-weighted reg normalization (fcos/loss.py:239-266)."""
        import jax

        torch = self.torch
        cfg = self.ref_cfg
        if cfg.is_frozen():
            cfg.defrost()
        cfg.MODEL.FCOS.CENTER_SAMPLING_RADIUS = 0.0
        cfg.MODEL.FCOS.IOU_LOSS_TYPE = "iou"
        cfg.MODEL.FCOS.NORM_REG_TARGETS = False
        rng = np.random.RandomState(29)

        box_cls_t, box_reg_t, ctr_t = [], [], []
        for (h, w) in SHAPES:
            box_cls_t.append(torch.as_tensor(
                rng.normal(-2.0, 1.0, (2, self.NUM_CLASSES, h, w))
                .astype(np.float32)).requires_grad_(True))
            box_reg_t.append(torch.as_tensor(
                rng.uniform(1.0, 64.0, (2, 4, h, w)).astype(np.float32))
                .requires_grad_(True))
            ctr_t.append(torch.as_tensor(
                rng.normal(0.0, 1.0, (2, 1, h, w)).astype(np.float32))
                .requires_grad_(True))
        gt_boxes_np, gt_labels_np, _ = make_gts(
            rng, 2, 4, include_tiny=False)
        targets, _ = make_ref_boxlists(
            gt_boxes_np, gt_labels_np, [], IMG_W, IMG_H)
        locations_t = [torch.as_tensor(p) for p in self.locations_np]

        from paa_core.modeling.rpn.fcos.loss import (
            make_fcos_loss_evaluator)

        evaluator = make_fcos_loss_evaluator(cfg)
        _shim_focal(evaluator, cfg.MODEL.FCOS.LOSS_GAMMA,
                    cfg.MODEL.FCOS.LOSS_ALPHA)
        ref_losses = evaluator(
            locations_t, box_cls_t, box_reg_t, ctr_t, targets)
        (ref_losses[0] + ref_losses[1] + ref_losses[2]).backward()

        from paa_tpu.modeling.fcos_loss import FCOSLossConfig, fcos_loss

        outputs = {
            "cls_logits": jnp.asarray(_flat_t(box_cls_t,
                                              self.NUM_CLASSES)),
            "box_regression": jnp.asarray(_flat_t(box_reg_t, 4)),
            "iou_pred": jnp.asarray(_flat_t(ctr_t, 1)[..., 0]),
        }
        gt_boxes, gt_labels = pad_gts(gt_boxes_np, gt_labels_np, 2)
        lc = FCOSLossConfig(
            gamma=cfg.MODEL.FCOS.LOSS_GAMMA,
            alpha=cfg.MODEL.FCOS.LOSS_ALPHA,
            strides=STRIDES,
            center_sampling_radius=0.0,
            iou_loss_type="iou",
            norm_reg_targets=False,
        )
        loc_flat = np.concatenate(self.locations_np, axis=0)
        loc_xyxy = np.concatenate([loc_flat, loc_flat], axis=1)

        def total_fn(out_dict):
            losses = fcos_loss(
                out_dict, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                jnp.asarray(loc_xyxy), self.level_counts, lc)
            return (losses["loss_cls"] + losses["loss_reg"]
                    + losses["loss_centerness"])

        grads = jax.grad(total_fn)(outputs)
        np.testing.assert_allclose(
            np.asarray(grads["cls_logits"]),
            _flat_t(box_cls_t, self.NUM_CLASSES, grad=True),
            rtol=1e-3, atol=1e-8, err_msg="d/d cls_logits")
        np.testing.assert_allclose(
            np.asarray(grads["box_regression"]),
            _flat_t(box_reg_t, 4, grad=True),
            rtol=1e-3, atol=1e-8, err_msg="d/d box_regression")
        np.testing.assert_allclose(
            np.asarray(grads["iou_pred"]),
            _flat_t(ctr_t, 1, grad=True)[..., 0],
            rtol=1e-3, atol=1e-8, err_msg="d/d centerness")

    def test_plain(self):
        self._assert_parity(*self._run_case(20))

    def test_center_sampling(self):
        self._assert_parity(*self._run_case(21, center_radius=1.5))

    def test_giou_norm_targets(self):
        self._assert_parity(*self._run_case(
            22, iou_loss_type="giou", norm_reg_targets=True))

    def test_linear_iou(self):
        self._assert_parity(*self._run_case(23, iou_loss_type="linear_iou"))


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestRetinaNetLossParity(unittest.TestCase):
    """Our retinanet_loss vs RetinaNetLossComputation
    (retinanet/loss.py:19-81)."""

    NUM_CLASSES = 8

    @classmethod
    def setUpClass(cls):
        import torch

        cls.torch = torch
        ref_torch.install_shims()
        from paa_core.config import cfg as ref_cfg

        if ref_cfg.is_frozen():
            ref_cfg.defrost()
        cls.ref_cfg = ref_cfg
        cls.anchors_np = make_anchors(SHAPES, STRIDES)
        cls.anchors_flat = np.concatenate(cls.anchors_np, axis=0)
        cls.level_counts = tuple(len(a) for a in cls.anchors_np)

    def _run_case(self, seed, batch=2, max_gt=4):
        torch = self.torch
        cfg = self.ref_cfg
        rng = np.random.RandomState(seed)

        box_cls_t, box_reg_t = [], []
        for (h, w) in SHAPES:
            box_cls_t.append(torch.as_tensor(
                rng.normal(-2.0, 1.0, (batch, self.NUM_CLASSES, h, w))
                .astype(np.float32)))
            box_reg_t.append(torch.as_tensor(
                rng.normal(0.0, 0.5, (batch, 4, h, w)).astype(np.float32)))

        gt_boxes_np, gt_labels_np, _ = make_gts(rng, batch, max_gt)
        targets, anchors_ref = make_ref_boxlists(
            gt_boxes_np, gt_labels_np, self.anchors_np, IMG_W, IMG_H)

        from paa_core.modeling.rpn.retinanet.loss import (
            make_retinanet_loss_evaluator)
        from paa_core.modeling.box_coder import BoxCoder

        evaluator = make_retinanet_loss_evaluator(
            cfg, BoxCoder(weights=(10., 10., 5., 5.)))
        evaluator.box_cls_loss_func.gamma = [
            cfg.MODEL.RETINANET.LOSS_GAMMA]
        evaluator.box_cls_loss_func.alpha = [
            cfg.MODEL.RETINANET.LOSS_ALPHA]
        captured = {}
        orig = evaluator.prepare_targets

        def capture(*a, **k):
            labels, reg_targets = orig(*a, **k)
            captured["labels"] = [l.clone() for l in labels]
            return labels, reg_targets

        evaluator.prepare_targets = capture
        with torch.no_grad():
            ref_losses = evaluator(
                anchors_ref, box_cls_t, box_reg_t, targets)
        ref_labels = np.stack(
            [l.numpy() for l in captured["labels"]], axis=0)

        from paa_tpu.modeling.retinanet_head import (
            RetinaNetLossConfig, retinanet_loss)

        def flatten(ts, c):
            return np.concatenate(
                [ref_torch.permute_and_flatten(t, 1, c) for t in ts], axis=1)

        outputs = {
            "cls_logits": jnp.asarray(flatten(box_cls_t, self.NUM_CLASSES)),
            "box_regression": jnp.asarray(flatten(box_reg_t, 4)),
        }
        gt_boxes, gt_labels = pad_gts(gt_boxes_np, gt_labels_np, batch)
        lc = RetinaNetLossConfig(
            gamma=cfg.MODEL.RETINANET.LOSS_GAMMA,
            alpha=cfg.MODEL.RETINANET.LOSS_ALPHA,
            fg_iou_threshold=cfg.MODEL.RETINANET.FG_IOU_THRESHOLD,
            bg_iou_threshold=cfg.MODEL.RETINANET.BG_IOU_THRESHOLD,
            bbox_reg_beta=cfg.MODEL.RETINANET.BBOX_REG_BETA,
            bbox_reg_weight=cfg.MODEL.RETINANET.BBOX_REG_WEIGHT,
        )
        out = retinanet_loss(
            outputs, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(self.anchors_flat), self.level_counts, lc)

        from paa_tpu.modeling.atss_loss import iou_assign

        labels, _ = iou_assign(
            jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(self.anchors_flat),
            lc.fg_iou_threshold, lc.bg_iou_threshold)
        return ref_losses, ref_labels, out, np.asarray(labels)

    def test_gradients(self):
        """d(total)/d(head outputs) vs reference autograd — pins the
        smooth-L1 backward and the per-GPU pos normalization
        (retinanet/loss.py:43-81)."""
        import jax

        torch = self.torch
        cfg = self.ref_cfg
        rng = np.random.RandomState(39)

        box_cls_t, box_reg_t = [], []
        for (h, w) in SHAPES:
            box_cls_t.append(torch.as_tensor(
                rng.normal(-2.0, 1.0, (2, self.NUM_CLASSES, h, w))
                .astype(np.float32)).requires_grad_(True))
            box_reg_t.append(torch.as_tensor(
                rng.normal(0.0, 0.5, (2, 4, h, w)).astype(np.float32))
                .requires_grad_(True))
        gt_boxes_np, gt_labels_np, _ = make_gts(rng, 2, 4)
        targets, anchors_ref = make_ref_boxlists(
            gt_boxes_np, gt_labels_np, self.anchors_np, IMG_W, IMG_H)

        from paa_core.modeling.rpn.retinanet.loss import (
            make_retinanet_loss_evaluator)
        from paa_core.modeling.box_coder import BoxCoder

        evaluator = make_retinanet_loss_evaluator(
            cfg, BoxCoder(weights=(10., 10., 5., 5.)))
        evaluator.box_cls_loss_func.gamma = [
            cfg.MODEL.RETINANET.LOSS_GAMMA]
        evaluator.box_cls_loss_func.alpha = [
            cfg.MODEL.RETINANET.LOSS_ALPHA]
        ref_losses = evaluator(anchors_ref, box_cls_t, box_reg_t,
                               targets)
        (ref_losses[0] + ref_losses[1]).backward()

        from paa_tpu.modeling.retinanet_head import (
            RetinaNetLossConfig, retinanet_loss)

        outputs = {
            "cls_logits": jnp.asarray(_flat_t(box_cls_t,
                                              self.NUM_CLASSES)),
            "box_regression": jnp.asarray(_flat_t(box_reg_t, 4)),
        }
        gt_boxes, gt_labels = pad_gts(gt_boxes_np, gt_labels_np, 2)
        lc = RetinaNetLossConfig(
            gamma=cfg.MODEL.RETINANET.LOSS_GAMMA,
            alpha=cfg.MODEL.RETINANET.LOSS_ALPHA,
            fg_iou_threshold=cfg.MODEL.RETINANET.FG_IOU_THRESHOLD,
            bg_iou_threshold=cfg.MODEL.RETINANET.BG_IOU_THRESHOLD,
            bbox_reg_beta=cfg.MODEL.RETINANET.BBOX_REG_BETA,
            bbox_reg_weight=cfg.MODEL.RETINANET.BBOX_REG_WEIGHT,
        )

        def total_fn(out_dict):
            losses = retinanet_loss(
                out_dict, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                jnp.asarray(self.anchors_flat), self.level_counts, lc)
            return losses["loss_retina_cls"] + losses["loss_retina_reg"]

        grads = jax.grad(total_fn)(outputs)
        np.testing.assert_allclose(
            np.asarray(grads["cls_logits"]),
            _flat_t(box_cls_t, self.NUM_CLASSES, grad=True),
            rtol=1e-3, atol=1e-8, err_msg="d/d cls_logits")
        np.testing.assert_allclose(
            np.asarray(grads["box_regression"]),
            _flat_t(box_reg_t, 4, grad=True),
            rtol=1e-3, atol=1e-8, err_msg="d/d box_regression")

    def test_seed0(self):
        ref_losses, ref_labels, out, _ = self._run_case(30)
        np.testing.assert_allclose(
            float(out["loss_retina_cls"]), float(ref_losses[0]), rtol=1e-4)
        np.testing.assert_allclose(
            float(out["loss_retina_reg"]), float(ref_losses[1]), rtol=1e-4)

    def test_seed1_labels(self):
        """Label parity modulo the centers-in-gt refinement: retinanet's
        matcher labels (before ATSS's in_gt filter) must agree where our
        iou_assign does not ignore."""
        ref_losses, ref_labels, out, our_labels = self._run_case(31)
        # iou_assign applies the ATSS 'IoU'-mode in_gt ignore; RetinaNet
        # keeps those as positives. Compare the underlying matcher result:
        # everywhere our label is not -1-due-to-in_gt they must be equal.
        mask = ~((our_labels == -1) & (ref_labels > 0))
        np.testing.assert_array_equal(
            np.where(mask, our_labels, 0), np.where(mask, ref_labels, 0))
        np.testing.assert_allclose(
            float(out["loss_retina_cls"]), float(ref_losses[0]), rtol=1e-4)
        np.testing.assert_allclose(
            float(out["loss_retina_reg"]), float(ref_losses[1]), rtol=1e-4)


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestRPNLossParity(unittest.TestCase):
    """Our rpn_loss vs RPNLossComputation (rpn/loss.py:22-131), with the
    sampler forced to take every non-ignored anchor (batch size >= #anchors,
    fraction 1.0) so the random subsample is the identity on both sides and
    the losses are deterministic. Covers the visibility discard."""

    @classmethod
    def setUpClass(cls):
        import torch

        cls.torch = torch
        ref_torch.install_shims()
        from paa_core.config import cfg as ref_cfg

        if ref_cfg.is_frozen():
            ref_cfg.defrost()
        cls.ref_cfg = ref_cfg
        cls.anchors_np = make_anchors(SHAPES, STRIDES)
        cls.anchors_flat = np.concatenate(cls.anchors_np, axis=0)
        cls.level_counts = tuple(len(a) for a in cls.anchors_np)

    def _run_case(self, seed, batch=2, max_gt=4):
        torch = self.torch
        cfg = self.ref_cfg
        if cfg.is_frozen():
            cfg.defrost()
        n_anchors = len(self.anchors_flat)
        cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = n_anchors
        cfg.MODEL.RPN.POSITIVE_FRACTION = 1.0
        rng = np.random.RandomState(seed)

        obj_t, box_reg_t = [], []
        for (h, w) in SHAPES:
            obj_t.append(torch.as_tensor(
                rng.normal(0.0, 1.0, (batch, 1, h, w)).astype(np.float32)))
            box_reg_t.append(torch.as_tensor(
                rng.normal(0.0, 0.5, (batch, 4, h, w)).astype(np.float32)))

        gt_boxes_np, gt_labels_np, _ = make_gts(rng, batch, max_gt)
        targets, anchors_ref = make_ref_boxlists(
            gt_boxes_np, gt_labels_np, self.anchors_np, IMG_W, IMG_H,
            with_visibility=True, straddle=0.0)

        from paa_core.modeling.rpn.loss import make_rpn_loss_evaluator
        from paa_core.modeling.box_coder import BoxCoder

        evaluator = make_rpn_loss_evaluator(
            cfg, BoxCoder(weights=(1.0, 1.0, 1.0, 1.0)))
        with torch.no_grad():
            ref_obj, ref_reg = evaluator(
                anchors_ref, obj_t, box_reg_t, targets)

        from paa_tpu.modeling.rpn import RPNConfig, rpn_loss
        import jax

        def flatten(ts, c):
            return np.concatenate(
                [ref_torch.permute_and_flatten(t, 1, c) for t in ts], axis=1)

        outputs = {
            "objectness": jnp.asarray(flatten(obj_t, 1)[..., 0]),
            "box_regression": jnp.asarray(flatten(box_reg_t, 4)),
        }
        gt_boxes, gt_labels = pad_gts(gt_boxes_np, gt_labels_np, batch)
        rc = RPNConfig(
            fg_iou_threshold=cfg.MODEL.RPN.FG_IOU_THRESHOLD,
            bg_iou_threshold=cfg.MODEL.RPN.BG_IOU_THRESHOLD,
            batch_size_per_image=n_anchors,
            positive_fraction=1.0,
            straddle_thresh=0.0,
        )
        sizes = jnp.asarray(
            [[float(IMG_H), float(IMG_W)]] * batch, jnp.float32)
        out = rpn_loss(
            outputs, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(self.anchors_flat), self.level_counts, rc,
            jax.random.PRNGKey(0), image_sizes=sizes)
        return (float(ref_obj), float(ref_reg)), out

    def test_seed0(self):
        (ref_obj, ref_reg), out = self._run_case(40)
        np.testing.assert_allclose(
            float(out["loss_objectness"]), ref_obj, rtol=1e-4)
        np.testing.assert_allclose(
            float(out["loss_rpn_box_reg"]), ref_reg, rtol=1e-4)

    def test_seed1(self):
        (ref_obj, ref_reg), out = self._run_case(41, max_gt=6)
        np.testing.assert_allclose(
            float(out["loss_objectness"]), ref_obj, rtol=1e-4)
        np.testing.assert_allclose(
            float(out["loss_rpn_box_reg"]), ref_reg, rtol=1e-4)


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestROIBoxLossParity(unittest.TestCase):
    """Our subsample_proposals + roi_box_loss vs FastRCNNLossComputation
    (box_head/loss.py:15-165). Head outputs are linear functions of the
    proposal coordinates so the (order-differing) sampled sets produce
    identical per-roi predictions on both sides; the sampler is again
    forced to keep everything."""

    NUM_CLASSES = 9  # 8 fg + background

    def _run_case(self, seed, n_proposals=64, max_gt=4):
        import torch

        ref_torch.install_shims()
        from paa_core.config import cfg as ref_cfg

        if ref_cfg.is_frozen():
            ref_cfg.defrost()
        S = 128
        ref_cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = S
        ref_cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
        rng = np.random.RandomState(seed)

        gt_boxes_np, gt_labels_np, _ = make_gts(
            rng, 1, max_gt, include_tiny=False)
        props = np.stack([
            rng.uniform(0, IMG_W * 0.8, n_proposals),
            rng.uniform(0, IMG_H * 0.8, n_proposals),
            rng.uniform(8, IMG_W * 0.5, n_proposals),
            rng.uniform(8, IMG_H * 0.5, n_proposals),
        ], axis=1).astype(np.float32)
        props[:, 2] = np.minimum(props[:, 0] + props[:, 2], IMG_W - 1)
        props[:, 3] = np.minimum(props[:, 1] + props[:, 3], IMG_H - 1)
        # mirror rpn/inference.py add_gt_proposals: GTs are appended
        props_with_gt = np.concatenate([props, gt_boxes_np[0]], axis=0)

        w_cls = rng.normal(0, 0.02, (4, self.NUM_CLASSES)).astype(np.float32)
        w_reg = rng.normal(0, 0.02, (4, 4 * self.NUM_CLASSES)).astype(
            np.float32)

        # ---- reference -------------------------------------------------
        from paa_core.structures.bounding_box import BoxList
        from paa_core.modeling.roi_heads.box_head.loss import (
            make_roi_box_loss_evaluator)

        targets, _ = make_ref_boxlists(
            gt_boxes_np, gt_labels_np, [], IMG_W, IMG_H)
        proposal_bl = BoxList(
            torch.as_tensor(props_with_gt), (IMG_W, IMG_H), mode="xyxy")
        evaluator = make_roi_box_loss_evaluator(ref_cfg)
        with torch.no_grad():
            sampled = evaluator.subsample([proposal_bl], targets)
            rois = sampled[0].bbox  # (S_ref, 4)
            class_logits = rois @ torch.as_tensor(w_cls)
            box_regression = rois @ torch.as_tensor(w_reg)
            ref_cls, ref_reg = evaluator(
                [class_logits], [box_regression])

        # ---- ours ------------------------------------------------------
        import jax
        from paa_tpu.modeling.roi_box_head import (
            ROIBoxConfig, roi_box_loss, subsample_proposals)

        bc = ROIBoxConfig(
            num_classes=self.NUM_CLASSES,
            fg_iou_threshold=ref_cfg.MODEL.ROI_HEADS.FG_IOU_THRESHOLD,
            bg_iou_threshold=ref_cfg.MODEL.ROI_HEADS.BG_IOU_THRESHOLD,
            batch_size_per_image=S,
            positive_fraction=1.0,
        )
        gt_boxes, gt_labels = pad_gts(gt_boxes_np, gt_labels_np, 1)
        (rois_j, roi_labels, reg_targets, roi_valid, _roi_gt_idx,
         _roi_gt_boxes) = subsample_proposals(
            jnp.asarray(props),  # gts appended inside
            jnp.ones((len(props),), bool),
            jnp.asarray(gt_boxes[0]), jnp.asarray(gt_labels[0]),
            bc, jax.random.PRNGKey(0))
        cls_logits = rois_j @ jnp.asarray(w_cls)
        box_deltas = (rois_j @ jnp.asarray(w_reg)).reshape(
            -1, self.NUM_CLASSES, 4)
        out = roi_box_loss(
            cls_logits, box_deltas, roi_labels, reg_targets, roi_valid)

        # same sampled multiset of rois?
        ours_set = sorted(
            map(tuple, np.round(np.asarray(rois_j)[np.asarray(roi_valid)],
                                3).tolist()))
        ref_set = sorted(map(tuple, np.round(rois.numpy(), 3).tolist()))
        self.assertEqual(ours_set, ref_set)
        return (float(ref_cls), float(ref_reg)), out

    def test_gradients(self):
        """d(total)/d(shared head weights) vs reference autograd. The
        two sides sample the same roi MULTISET in different order, so
        per-roi gradients are not comparable — but the predictions are
        linear in the rois through shared weights, and the weight
        gradients sum over rois (order-invariant). Pins the
        cross-entropy + sum-normalized smooth-L1 backward
        (box_head/loss.py:130-165)."""
        import torch

        ref_torch.install_shims()
        from paa_core.config import cfg as ref_cfg

        if ref_cfg.is_frozen():
            ref_cfg.defrost()
        S = 128
        ref_cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = S
        ref_cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
        rng = np.random.RandomState(55)

        gt_boxes_np, gt_labels_np, _ = make_gts(
            rng, 1, 4, include_tiny=False)
        props = np.stack([
            rng.uniform(0, IMG_W * 0.8, 64),
            rng.uniform(0, IMG_H * 0.8, 64),
            rng.uniform(8, IMG_W * 0.5, 64),
            rng.uniform(8, IMG_H * 0.5, 64),
        ], axis=1).astype(np.float32)
        props[:, 2] = np.minimum(props[:, 0] + props[:, 2], IMG_W - 1)
        props[:, 3] = np.minimum(props[:, 1] + props[:, 3], IMG_H - 1)
        props_with_gt = np.concatenate([props, gt_boxes_np[0]], axis=0)
        w_cls = rng.normal(0, 0.02, (4, self.NUM_CLASSES)).astype(
            np.float32)
        w_reg = rng.normal(0, 0.02, (4, 4 * self.NUM_CLASSES)).astype(
            np.float32)

        from paa_core.structures.bounding_box import BoxList
        from paa_core.modeling.roi_heads.box_head.loss import (
            make_roi_box_loss_evaluator)

        targets, _ = make_ref_boxlists(
            gt_boxes_np, gt_labels_np, [], IMG_W, IMG_H)
        proposal_bl = BoxList(
            torch.as_tensor(props_with_gt), (IMG_W, IMG_H), mode="xyxy")
        evaluator = make_roi_box_loss_evaluator(ref_cfg)
        w_cls_t = torch.as_tensor(w_cls).requires_grad_(True)
        w_reg_t = torch.as_tensor(w_reg).requires_grad_(True)
        with torch.no_grad():
            sampled = evaluator.subsample([proposal_bl], targets)
            rois = sampled[0].bbox
        ref_cls, ref_reg = evaluator(
            [rois @ w_cls_t], [rois @ w_reg_t])
        (ref_cls + ref_reg).backward()

        import jax
        from paa_tpu.modeling.roi_box_head import (
            ROIBoxConfig, roi_box_loss, subsample_proposals)

        bc = ROIBoxConfig(
            num_classes=self.NUM_CLASSES,
            fg_iou_threshold=ref_cfg.MODEL.ROI_HEADS.FG_IOU_THRESHOLD,
            bg_iou_threshold=ref_cfg.MODEL.ROI_HEADS.BG_IOU_THRESHOLD,
            batch_size_per_image=S,
            positive_fraction=1.0,
        )
        gt_boxes, gt_labels = pad_gts(gt_boxes_np, gt_labels_np, 1)
        (rois_j, roi_labels, reg_targets, roi_valid, _i, _b) = (
            subsample_proposals(
                jnp.asarray(props), jnp.ones((len(props),), bool),
                jnp.asarray(gt_boxes[0]), jnp.asarray(gt_labels[0]),
                bc, jax.random.PRNGKey(0)))

        def total_fn(ws):
            cls_logits = rois_j @ ws[0]
            box_deltas = (rois_j @ ws[1]).reshape(
                -1, self.NUM_CLASSES, 4)
            out = roi_box_loss(
                cls_logits, box_deltas, roi_labels, reg_targets,
                roi_valid)
            return out["loss_classifier"] + out["loss_box_reg"]

        g_cls, g_reg = jax.grad(total_fn)(
            (jnp.asarray(w_cls), jnp.asarray(w_reg)))
        np.testing.assert_allclose(
            np.asarray(g_cls), w_cls_t.grad.numpy(),
            rtol=1e-3, atol=1e-7, err_msg="d/d w_cls")
        np.testing.assert_allclose(
            np.asarray(g_reg), w_reg_t.grad.numpy(),
            rtol=1e-3, atol=1e-7, err_msg="d/d w_reg")

    def test_seed0(self):
        (ref_cls, ref_reg), out = self._run_case(50)
        np.testing.assert_allclose(
            float(out["loss_classifier"]), ref_cls, rtol=1e-4)
        np.testing.assert_allclose(
            float(out["loss_box_reg"]), ref_reg, rtol=1e-4)

    def test_seed1(self):
        (ref_cls, ref_reg), out = self._run_case(51, n_proposals=96,
                                                 max_gt=6)
        np.testing.assert_allclose(
            float(out["loss_classifier"]), ref_cls, rtol=1e-4)
        np.testing.assert_allclose(
            float(out["loss_box_reg"]), ref_reg, rtol=1e-4)


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestROIMaskLossParity(unittest.TestCase):
    """Mask loss vs MaskRCNNLossComputation (mask_head/loss.py:45-128).

    Two claims, tested separately:
    1. The LOSS FORMULA is exact: given identical 28x28 targets, our
       per-class-channel BCE equals the reference's
       binary_cross_entropy_with_logits over positives (channel c-1
       here == channel c there; its background channel is never used).
    2. The TARGETS approximate: the reference crops the GT polygon to
       each proposal and rasterizes at 28x28
       (project_masks_on_boxes, loss.py:11-42); we bilinear-crop a
       box-frame 28x28 raster (an accepted resolution trade for the
       static-shape pipeline, PARITY.md). For rectangle polygons the
       two targets must agree to high IoU.
    """

    NUM_CLASSES = 5  # incl. background

    def _setup_case(self, seed):
        import torch

        ref_torch.install_shims()
        from paa_core.structures.bounding_box import BoxList
        from paa_core.structures.segmentation_mask import SegmentationMask

        rng = np.random.RandomState(seed)
        W, H = 80, 64
        # GT: axis-aligned rectangles (exact under both rasterizations)
        g = 3
        gt_boxes, polys, labels = [], [], []
        for k in range(g):
            x1 = rng.uniform(2, W * 0.5)
            y1 = rng.uniform(2, H * 0.5)
            w = rng.uniform(14, W * 0.45)
            h = rng.uniform(12, H * 0.45)
            x2, y2 = min(x1 + w, W - 2.0), min(y1 + h, H - 2.0)
            gt_boxes.append([x1, y1, x2, y2])
            # polygon: the inner 80% rectangle of the box
            ix1, iy1 = x1 + 0.1 * (x2 - x1), y1 + 0.1 * (y2 - y1)
            ix2, iy2 = x2 - 0.1 * (x2 - x1), y2 - 0.1 * (y2 - y1)
            polys.append([[ix1, iy1, ix2, iy1, ix2, iy2, ix1, iy2]])
            labels.append(int(rng.randint(1, self.NUM_CLASSES)))

        # proposals: jittered copies of the gts (guaranteed positives)
        props = []
        for k in range(g):
            b = np.asarray(gt_boxes[k]) + rng.normal(0, 2.0, 4)
            b[0::2] = np.clip(b[0::2], 0, W - 1)
            b[1::2] = np.clip(b[1::2], 0, H - 1)
            props.append([min(b[0], b[2]), min(b[1], b[3]),
                          max(b[0], b[2]), max(b[1], b[3])])
        props = np.asarray(props, np.float32)

        target_bl = BoxList(torch.as_tensor(np.asarray(gt_boxes,
                                                       np.float32)),
                            (W, H), mode="xyxy")
        target_bl.add_field("labels", torch.as_tensor(
            np.asarray(labels, np.int64)))
        target_bl.add_field("masks", SegmentationMask(polys, (W, H),
                                                      mode="poly"))
        prop_bl = BoxList(torch.as_tensor(props), (W, H), mode="xyxy")
        return (torch, gt_boxes, polys, labels, props, target_bl,
                prop_bl, (W, H))

    def test_formula_exact_and_targets_close(self):
        (torch, gt_boxes, polys, labels, props, target_bl, prop_bl,
         (W, H)) = self._setup_case(0)
        from paa_core.modeling.roi_heads.mask_head.loss import (
            make_roi_mask_loss_evaluator)
        from paa_core.config import cfg as ref_cfg

        if ref_cfg.is_frozen():
            ref_cfg.defrost()
        ref_cfg.MODEL.ROI_MASK_HEAD.RESOLUTION = 28
        evaluator = make_roi_mask_loss_evaluator(ref_cfg)

        rng = np.random.RandomState(1)
        r = len(props)
        logits_np = rng.normal(
            0, 1, (r, self.NUM_CLASSES, 28, 28)).astype(np.float32)
        with torch.no_grad():
            ref_loss = evaluator(
                [prop_bl], torch.as_tensor(logits_np), [target_bl])
            ref_labels, ref_targets = evaluator.prepare_targets(
                [prop_bl], [target_bl])
        ref_targets = ref_targets[0].numpy()  # (n_pos, 28, 28)
        ref_labels = ref_labels[0].numpy()

        # ---- 1. formula exactness on the reference's own targets ----
        from paa_tpu.modeling.roi_mask_head import mask_loss

        pos = ref_labels > 0
        # prepare_targets returns targets for POSITIVES only, in index
        # order; mask_loss takes per-roi targets and masks internally
        full_targets = np.zeros((r, 28, 28), np.float32)
        full_targets[pos] = ref_targets
        # channel layout: ours drops background, so channel = label - 1
        ours_logits = jnp.asarray(
            np.transpose(logits_np[:, 1:], (0, 2, 3, 1)))
        out = mask_loss(
            ours_logits,
            jnp.asarray(ref_labels.astype(np.int32)),
            jnp.asarray(full_targets),
            jnp.ones((r,), bool),
        )
        np.testing.assert_allclose(
            float(out["loss_mask"]), float(ref_loss), rtol=1e-5)

        # ---- 2. target approximation quality -------------------------
        from paa_tpu.modeling.roi_mask_head import crop_gt_masks_for_rois

        # box-frame 28x28 rasters of the inner-80% rectangle polygons
        m = 28
        gt_masks = np.zeros((r, m, m), np.float32)
        for k, (bx, poly) in enumerate(zip(gt_boxes, polys)):
            x1, y1, x2, y2 = bx
            px = np.asarray(poly[0][0::2])
            py = np.asarray(poly[0][1::2])
            # map polygon corners into box-frame pixels
            fx = (px - x1) / max(x2 - x1, 1e-6) * m
            fy = (py - y1) / max(y2 - y1, 1e-6) * m
            xs = slice(int(round(fx.min())), int(round(fx.max())))
            ys = slice(int(round(fy.min())), int(round(fy.max())))
            gt_masks[k, ys, xs] = 1.0
        ours_targets = np.asarray(crop_gt_masks_for_rois(
            jnp.asarray(gt_masks),
            jnp.asarray(np.asarray(gt_boxes, np.float32)),
            jnp.asarray(props),
            out_size=28,
        ))
        inter = np.logical_and(ours_targets > 0.5, ref_targets > 0.5)
        union = np.logical_or(ours_targets > 0.5, ref_targets > 0.5)
        iou = inter.sum() / max(union.sum(), 1)
        self.assertGreater(
            iou, 0.9,
            f"mask target rasterization IoU {iou:.3f} vs reference",
        )


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestROIKeypointLossParity(unittest.TestCase):
    """Keypoint loss vs KeypointRCNNLossComputation.__call__
    (keypoint_head/loss.py:144-170) + keypoints_to_heat_map
    (structures/keypoint.py:154-188): identical proposals and GT
    keypoints must produce the same heatmap cross-entropy — including
    the x==x2 boundary snap, out-of-roi invalidation, and visibility
    gating."""

    def test_loss_matches(self):
        import torch

        ref_torch.install_shims()
        from paa_core.structures.bounding_box import BoxList
        from paa_core.structures.keypoint import PersonKeypoints
        from paa_core.modeling.roi_heads.keypoint_head.loss import (
            KeypointRCNNLossComputation)

        rng = np.random.RandomState(3)
        W, H, K, S = 120, 96, 17, 14
        r = 6
        rois = []
        for _ in range(r):
            x = np.sort(rng.uniform(0, W - 10, 2) + [0, 10])
            y = np.sort(rng.uniform(0, H - 10, 2) + [0, 10])
            rois.append([x[0], y[0], x[1], y[1]])
        rois = np.asarray(rois, np.float32)

        kps = np.zeros((r, K, 3), np.float32)
        for i in range(r):
            # mix: inside-roi visible, outside-roi visible, invisible,
            # and exact right/bottom-boundary points (the snap rule)
            kps[i, :, 0] = rng.uniform(0, W, K)
            kps[i, :, 1] = rng.uniform(0, H, K)
            kps[i, :, 2] = (rng.rand(K) > 0.3).astype(np.float32)
            kps[i, 0, :2] = [rois[i, 2], rois[i, 3]]  # boundary snap
            kps[i, 0, 2] = 1.0

        logits = rng.normal(0, 1, (r, K, S, S)).astype(np.float32)

        bl = BoxList(torch.as_tensor(rois), (W, H), mode="xyxy")
        bl.add_field(
            "keypoints",
            PersonKeypoints(torch.as_tensor(kps), (W, H)),
        )
        evaluator = KeypointRCNNLossComputation(None, None, S)
        with torch.no_grad():
            ref_loss = evaluator([bl], torch.as_tensor(logits))

        from paa_tpu.modeling.roi_keypoint_head import keypoint_loss

        out = keypoint_loss(
            jnp.asarray(np.transpose(logits, (0, 2, 3, 1))),
            jnp.asarray(rois),
            jnp.asarray(kps),
            jnp.ones((r,), bool),
        )
        np.testing.assert_allclose(
            float(out["loss_kp"]), float(ref_loss), rtol=1e-5)


if __name__ == "__main__":
    unittest.main()
