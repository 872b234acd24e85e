"""END-TO-END gradient parity: d(total loss)/d(every parameter) of the
flagship PAA-R50 model vs the reference's autograd.

This is the strongest train-path proof available without COCO data: the
reference torch model and our flax model share imported (randomized)
weights, see the same image and GT boxes, run their OWN full pipelines
(backbone -> FPN -> towers -> anchor generation -> GMM assignment ->
focal/GIoU/BCE losses), and every parameter gradient must agree after
mapping through the importer's layout transforms (gradients transform
exactly like the weights: transposes for convs, reshape for Scale). A
mismatch anywhere — a stray stop_gradient, a loss normalization
difference, a wrong anchor layout, a transform error — shows up in some
parameter's gradient.

Reference train path: generalized_rcnn.py:33-50 ->
rpn/paa/paa.py:137-148 -> rpn/paa/loss.py:267-359.
"""

import unittest

import numpy as np

import jax
import jax.numpy as jnp
import pytest

import ref_torch

# full-model build + eager autodiff: minutes on the 1-core CPU runner
pytestmark = pytest.mark.slow

HW = (96, 128)


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestFullModelGradParity(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        import torch

        cls.torch = torch
        cls.ref_model, cls.ref_cfg = ref_torch.build_reference_model()
        # the reference focal loss CPU fallback indexes gamma[0]/alpha[0]
        # (sigmoid_focal_loss.py:42-43); wrap like the loss parity tests
        ev = cls.ref_model.rpn.loss_evaluator
        ev.cls_loss_func.gamma = [cls.ref_cfg.MODEL.PAA.LOSS_GAMMA]
        ev.cls_loss_func.alpha = [cls.ref_cfg.MODEL.PAA.LOSS_ALPHA]
        cls.state = ref_torch.randomize_state_dict(cls.ref_model, seed=3)

        from paa_tpu.config import get_cfg
        from paa_tpu.modeling import build_detection_model
        from paa_tpu.utils.torch_import import load_torch_state_dict

        cfg = get_cfg()
        cfg.merge_from_file("configs/paa/paa_R_50_FPN_1x.yaml")
        cfg.MODEL.WEIGHT = ""
        cls.cfg = cfg
        cls.flax_model = build_detection_model(cfg)
        variables = cls.flax_model.init(jax.random.PRNGKey(0), HW)
        cls.params = load_torch_state_dict(variables["params"], cls.state)

        rng = np.random.RandomState(17)
        cls.image = rng.normal(0.0, 1.0, (1, *HW, 3)).astype(np.float32)
        cls.gt_boxes = np.asarray(
            [[[10.0, 12.0, 70.0, 60.0], [50.0, 30.0, 120.0, 90.0]]],
            np.float32,
        )
        cls.gt_labels = np.asarray([[3, 7]], np.int32)

    def test_losses_and_param_grads_match(self):
        torch = self.torch
        from paa_core.structures.bounding_box import BoxList
        from paa_core.structures.image_list import to_image_list

        self.ref_model.train()
        x = torch.as_tensor(np.transpose(self.image, (0, 3, 1, 2)))
        images = to_image_list([x[0]], 32)
        target = BoxList(
            torch.as_tensor(self.gt_boxes[0]), (HW[1], HW[0]),
            mode="xyxy",
        )
        target.add_field("labels", torch.as_tensor(
            self.gt_labels[0].astype(np.int64)))
        self.ref_model.zero_grad()
        ref_losses = self.ref_model(images, [target])
        ref_total = sum(ref_losses.values())
        ref_total.backward()

        from paa_tpu.modeling.paa_loss import PAALossConfig, paa_loss

        anchors, counts = self.flax_model.anchors_for(HW)
        lcfg = PAALossConfig.from_cfg(self.cfg)
        gtb = jnp.asarray(self.gt_boxes)
        gtl = jnp.asarray(self.gt_labels)
        anchors_j = jnp.asarray(anchors)
        img = jnp.asarray(self.image)
        module = self.flax_model.module

        def total_fn(params):
            out = module.apply({"params": params}, img)
            losses = paa_loss(out, gtb, gtl, anchors_j, counts, lcfg)
            return (losses["loss_cls"] + losses["loss_reg"]
                    + losses["loss_iou_pred"]), losses

        (our_total, our_losses), grads = jax.value_and_grad(
            total_fn, has_aux=True)(self.params)

        # loss values through the REAL model (the synthetic-head parity
        # in test_ref_loss_parity.py does not exercise the towers)
        np.testing.assert_allclose(
            float(our_losses["loss_cls"]),
            float(ref_losses["loss_cls"].detach()), rtol=2e-4)
        np.testing.assert_allclose(
            float(our_losses["loss_reg"]),
            float(ref_losses["loss_reg"].detach()), rtol=2e-4)
        np.testing.assert_allclose(
            float(our_losses["loss_iou_pred"]),
            float(ref_losses["loss_iou_pred"].detach()), rtol=2e-4)

        # every torch parameter gradient must equal ours after the same
        # layout transform the importer applies to the weight itself
        from paa_tpu.utils.torch_import import (
            _apply_transform,
            torch_name_to_flax_path,
        )

        checked, failures, unmapped = 0, [], []
        for name, p in self.ref_model.named_parameters():
            if p.grad is None:
                # FREEZE_CONV_BODY_AT=2 freezes stem + layer1
                # (resnet.py:134-143); everything else must have a grad
                continue
            mapping = torch_name_to_flax_path(name)
            if mapping is None:
                unmapped.append(name)
                continue
            path, kind = mapping
            node = grads
            for k in path:
                node = node[k]
            ref_g = _apply_transform(
                p.grad.detach().numpy(), kind, 7)
            ours_g = np.asarray(node, np.float64)
            ref_g = np.asarray(ref_g, np.float64)
            scale = max(
                np.abs(ref_g).max(), np.abs(ours_g).max(), 1e-12)
            err = np.abs(ours_g - ref_g).max() / scale
            checked += 1
            if err > 2e-3:
                failures.append((name, float(err)))
        # every grad-bearing torch parameter must map and compare.
        # PAA R-50 with the default stage-2 freeze: 101 tensors
        # (layer2-4 convs; FPN, tower and predictor convs w+b; tower
        # GN affines; 5 Scale scalars) — FrozenBN affines are buffers
        # and stem/layer1 are frozen, so they carry no grad.
        self.assertEqual(unmapped, [])
        self.assertGreaterEqual(checked, 101)
        self.assertEqual(failures, [])

        # ---- part 2: one SGD step from these gradients ---------------
        # validates the whole solver surface at once: per-group lr
        # (bias x BIAS_LR_FACTOR, WEIGHT_DECAY_BIAS), momentum ordering
        # (decay into the gradient BEFORE the trace), the warmup-factor
        # lr at iteration 0, and the freeze partition (frozen params
        # must not move on either side). Reference: solver/build.py:
        # 7-37 + WarmupMultiStepLR (lr_scheduler.py:10-52).
        import optax

        from paa_core.solver import (
            make_lr_scheduler,
            make_optimizer as ref_make_optimizer,
        )

        ref_opt = ref_make_optimizer(self.ref_cfg, self.ref_model)
        make_lr_scheduler(self.ref_cfg, ref_opt)  # sets warmup lr @ it 0
        ref_opt.step()

        from paa_tpu.solver.build import make_optimizer

        tx, _labels = make_optimizer(self.cfg, self.params)
        opt_state = tx.init(self.params)
        updates, _ = tx.update(grads, opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)

        step_failures = []
        for name, p in self.ref_model.named_parameters():
            mapping = torch_name_to_flax_path(name)
            if mapping is None:
                continue
            path, kind = mapping
            old = new = new_params
            for k in path:
                new = new[k]
            old = self.params
            for k in path:
                old = old[k]
            ref_new = _apply_transform(
                p.detach().numpy(), kind, 7)
            ours_delta = np.asarray(new, np.float64) - np.asarray(
                old, np.float64)
            ref_delta = np.asarray(ref_new, np.float64) - np.asarray(
                old, np.float64)
            scale = max(
                np.abs(ref_delta).max(), np.abs(ours_delta).max(), 1e-12)
            # both sides store f32 weights; a delta near the weight's
            # ulp (|w| * 2^-23) cancels to quantization noise when
            # differenced — allow that floor on top of the relative tol
            quant = 4 * 1.2e-7 * max(
                np.abs(np.asarray(old, np.float64)).max(), 1e-12)
            err = np.abs(ours_delta - ref_delta).max()
            frozen_ref = not np.any(ref_delta)
            frozen_ours = not np.any(ours_delta)
            if frozen_ref != frozen_ours:
                step_failures.append((name, "freeze mismatch"))
            elif not frozen_ref and err > 2e-3 * scale + quant:
                step_failures.append((name, float(err / scale)))
        self.assertEqual(step_failures, [])


class _DenseGradParityBase:
    """Generic full-model gradient parity for the other dense heads:
    same recipe as the PAA test, driven through the model-agnostic
    loss_fn()/anchors_for() surface."""

    REF_CONFIG: str
    HW = (96, 128)
    # cfg group holding LOSS_GAMMA/LOSS_ALPHA for the CPU focal shim
    CFG_GROUP: str

    @classmethod
    def setUpClass(cls):
        import torch

        cls.torch = torch
        cls.ref_model, cls.ref_cfg = ref_torch.build_reference_model(
            cls.REF_CONFIG)
        group = getattr(cls.ref_cfg.MODEL, cls.CFG_GROUP)
        ev = cls.ref_model.rpn.loss_evaluator
        ev.cls_loss_func.gamma = [group.LOSS_GAMMA]
        ev.cls_loss_func.alpha = [group.LOSS_ALPHA]
        cls.state = ref_torch.randomize_state_dict(cls.ref_model, seed=4)

        from paa_tpu.config import get_cfg
        from paa_tpu.modeling import build_detection_model
        from paa_tpu.utils.torch_import import load_torch_state_dict

        cfg = get_cfg()
        cfg.merge_from_file(f"/root/reference/{cls.REF_CONFIG}")
        cfg.MODEL.WEIGHT = ""
        cls.cfg = cfg
        cls.flax_model = build_detection_model(cfg)
        variables = cls.flax_model.init(jax.random.PRNGKey(0), cls.HW)
        cls.params = load_torch_state_dict(variables["params"], cls.state)

        rng = np.random.RandomState(23)
        h, w = cls.HW
        cls.image = rng.normal(0.0, 1.0, (1, h, w, 3)).astype(np.float32)
        cls.gt_boxes = np.asarray(
            [[[0.1 * w, 0.1 * h, 0.6 * w, 0.5 * h],
              [0.4 * w, 0.3 * h, 0.9 * w, 0.8 * h]]], np.float32)
        cls.gt_labels = np.asarray([[3, 7]], np.int32)

    def test_losses_and_param_grads_match(self):
        torch = self.torch
        from paa_core.structures.bounding_box import BoxList
        from paa_core.structures.image_list import to_image_list

        h, w = self.HW
        self.ref_model.train()
        x = torch.as_tensor(np.transpose(self.image, (0, 3, 1, 2)))
        images = to_image_list([x[0]], 32)
        target = BoxList(
            torch.as_tensor(self.gt_boxes[0]), (w, h), mode="xyxy")
        target.add_field("labels", torch.as_tensor(
            self.gt_labels[0].astype(np.int64)))
        self.ref_model.zero_grad()
        ref_losses = self.ref_model(images, [target])
        ref_total = sum(ref_losses.values())
        ref_total.backward()

        anchors, counts = self.flax_model.anchors_for(self.HW)
        loss_call, loss_cfg = self.flax_model.loss_fn()
        gtb = jnp.asarray(self.gt_boxes)
        gtl = jnp.asarray(self.gt_labels)
        anchors_j = jnp.asarray(anchors)
        img = jnp.asarray(self.image)
        module = self.flax_model.module

        def total_fn(params):
            out = module.apply({"params": params}, img)
            losses = loss_call(
                out, gtb, gtl, anchors_j, counts, loss_cfg)
            # keep loss terms only (the dicts also carry metrics
            # such as num_pos)
            losses = {
                k: v for k, v in losses.items() if k.startswith("loss")
            }
            return sum(losses.values()), losses

        (our_total, our_losses), grads = jax.value_and_grad(
            total_fn, has_aux=True)(self.params)

        # component sets differ in naming across heads: compare the
        # sorted loss values, then the total
        np.testing.assert_allclose(
            sorted(float(v) for v in our_losses.values()),
            sorted(float(v.detach()) for v in ref_losses.values()),
            rtol=2e-4)

        from paa_tpu.utils.torch_import import (
            _apply_transform,
            torch_name_to_flax_path,
        )

        checked, failures, unmapped = 0, [], []
        for name, p in self.ref_model.named_parameters():
            if p.grad is None:
                continue
            mapping = torch_name_to_flax_path(name)
            if mapping is None:
                unmapped.append(name)
                continue
            path, kind = mapping
            node = grads
            for k in path:
                node = node[k]
            ref_g = _apply_transform(p.grad.detach().numpy(), kind, 7)
            ours_g = np.asarray(node, np.float64)
            ref_g = np.asarray(ref_g, np.float64)
            scale = max(
                np.abs(ref_g).max(), np.abs(ours_g).max(), 1e-12)
            err = np.abs(ours_g - ref_g).max() / scale
            checked += 1
            if err > 2e-3:
                failures.append((name, float(err)))
        self.assertEqual(unmapped, [])
        self.assertGreaterEqual(checked, 100)
        self.assertEqual(failures, [])


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestATSSFullModelGradParity(_DenseGradParityBase,
                                  unittest.TestCase):
    # ATSS's per-level topk(9) needs >= 9 anchors on EVERY level
    # (atss/loss.py:155): 384x512 gives 12 on the stride-128 level
    REF_CONFIG = "configs/atss/atss_R_50_FPN_1x.yaml"
    CFG_GROUP = "ATSS"
    HW = (384, 512)


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestFCOSFullModelGradParity(_DenseGradParityBase,
                                  unittest.TestCase):
    REF_CONFIG = "configs/fcos/fcos_R_50_FPN_1x.yaml"
    CFG_GROUP = "FCOS"


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestFasterRCNNFullModelGradParity(unittest.TestCase):
    """TWO-STAGE full-model gradient parity (Faster R-CNN R-50 FPN).

    The samplers are forced to keep everything (BATCH_SIZE >= all
    candidates, POSITIVE_FRACTION 1.0) so both sides' random subsampling
    is the identity, and batch size is 1 so the reference's PER-BATCH
    train-time FPN post-NMS selection (rpn/inference.py:152-170)
    coincides with our per-image one. The proposal MULTISETS must then
    match exactly (same pre-NMS top-k, same greedy NMS, same add-GT),
    making every loss value and every parameter gradient comparable —
    per-roi ordering differs, but head/backbone weight gradients sum
    over rois. This certifies the full two-stage train pipeline: RPN
    head + loss, train-time proposal selection, ROI sampling, box head
    and loss, and the shared backbone gradients through BOTH stages."""

    HW = (96, 128)
    OPTS = [
        "MODEL.RPN.BATCH_SIZE_PER_IMAGE", "2048",
        "MODEL.RPN.POSITIVE_FRACTION", "1.0",
        "MODEL.RPN.PRE_NMS_TOP_N_TRAIN", "300",
        "MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN", "128",
        "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "512",
        "MODEL.ROI_HEADS.POSITIVE_FRACTION", "1.0",
    ]

    @classmethod
    def setUpClass(cls):
        import torch

        cls.torch = torch
        cls.ref_model, cls.ref_cfg = ref_torch.build_reference_model(
            "configs/e2e_faster_rcnn_R_50_FPN_1x.yaml", opts=cls.OPTS)
        cls.state = ref_torch.randomize_state_dict(cls.ref_model, seed=8)

        from paa_tpu.config import get_cfg
        from paa_tpu.modeling import build_detection_model
        from paa_tpu.utils.torch_import import load_torch_state_dict

        cfg = get_cfg()
        cfg.merge_from_file(
            "/root/reference/configs/e2e_faster_rcnn_R_50_FPN_1x.yaml")
        cfg.merge_from_list(list(cls.OPTS))
        cfg.MODEL.WEIGHT = ""
        cls.cfg = cfg
        cls.flax_model = build_detection_model(cfg)
        variables = cls.flax_model.init(jax.random.PRNGKey(0), cls.HW)
        cls.variables = dict(variables)
        cls.params = load_torch_state_dict(variables["params"], cls.state)

        rng = np.random.RandomState(31)
        h, w = cls.HW
        cls.image = rng.normal(0.0, 1.0, (1, h, w, 3)).astype(np.float32)
        cls.gt_boxes = np.asarray(
            [[[10.0, 12.0, 70.0, 60.0], [50.0, 30.0, 120.0, 90.0]]],
            np.float32)
        cls.gt_labels = np.asarray([[3, 7]], np.int32)

    def test_losses_and_param_grads_match(self):
        torch = self.torch
        from paa_core.structures.bounding_box import BoxList
        from paa_core.structures.image_list import to_image_list

        h, w = self.HW
        self.ref_model.train()
        x = torch.as_tensor(np.transpose(self.image, (0, 3, 1, 2)))
        images = to_image_list([x[0]], 32)
        target = BoxList(
            torch.as_tensor(self.gt_boxes[0]), (w, h), mode="xyxy")
        target.add_field("labels", torch.as_tensor(
            self.gt_labels[0].astype(np.int64)))
        self.ref_model.zero_grad()
        ref_losses = self.ref_model(images, [target])
        sum(ref_losses.values()).backward()

        from paa_tpu.modeling.two_stage import (
            faster_rcnn_train_step_fns,
        )

        loss_fn = faster_rcnn_train_step_fns(self.flax_model, self.HW)
        img = jnp.asarray(self.image)
        gtb = jnp.asarray(self.gt_boxes)
        gtl = jnp.asarray(self.gt_labels)
        sizes = jnp.asarray([[float(h), float(w)]], jnp.float32)
        rng = jax.random.PRNGKey(0)

        def total_fn(params):
            variables = dict(self.variables)
            variables["params"] = params
            losses = loss_fn(variables, img, gtb, gtl, sizes, rng)
            losses = {
                k: v for k, v in losses.items() if k.startswith("loss")
            }
            return sum(losses.values()), losses

        (_, our_losses), grads = jax.value_and_grad(
            total_fn, has_aux=True)(self.params)
        grads = grads if "params" not in grads else grads["params"]

        np.testing.assert_allclose(
            sorted(float(v) for v in our_losses.values()),
            sorted(float(v.detach()) for v in ref_losses.values()),
            rtol=3e-4)

        from paa_tpu.utils.torch_import import (
            _apply_transform,
            _flax_candidates_for_torch_name,
        )

        checked, failures, unmapped = 0, [], []
        for name, p in self.ref_model.named_parameters():
            if p.grad is None:
                continue
            cands = _flax_candidates_for_torch_name(name)
            node = None
            for path, kind in cands:
                try:
                    node = grads
                    for k in path:
                        node = node[k]
                    break
                except KeyError:
                    node = None
            if node is None:
                unmapped.append(name)
                continue
            ref_g = _apply_transform(
                p.grad.detach().numpy(), kind,
                self.cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION)
            ours_g = np.asarray(node, np.float64)
            ref_g = np.asarray(ref_g, np.float64)
            scale = max(np.abs(ref_g).max(), np.abs(ours_g).max(), 1e-12)
            err = np.abs(ours_g - ref_g).max() / scale
            checked += 1
            if err > 3e-3:
                failures.append((name, float(err)))
        self.assertEqual(unmapped, [])
        # R-50 FPN Faster R-CNN: backbone layers2-4 + FPN + RPN head +
        # fc6/fc7 + predictors all carry grads
        self.assertGreaterEqual(checked, 60)
        self.assertEqual(failures, [])
