"""N-STEP training-trajectory parity vs the torch reference.

test_full_model_grad_parity.py proves one SGD step matches the
reference exactly. This test closes the remaining correctness link —
that CONSECUTIVE steps stay matched through the feedback loop where the
GMM assignments drift as the weights move (momentum accumulation,
linear warmup lr, assignment -> loss -> update -> assignment):

  for t in 0..N-1:  fwd -> PAA GMM assignment -> losses -> bwd ->
                    SGD(momentum, warmup lr at t) -> params(t+1)

Both sides start from the SAME randomized weights, see the SAME cycle
of synthetic batches, and run their OWN full pipelines (the reference
executes /root/reference/paa_core: trainer hot loop semantics from
engine/trainer.py:57-113 — optimizer.step() then scheduler.step() — and
WarmupMultiStepLR from solver/lr_scheduler.py:10-52). Asserted per
step: every loss term, the positive-assignment SET (exact equality —
captured from the reference by hooking PAALossComputation.compute_paa),
and at the end the cumulative parameter delta of every trainable
tensor.

Everything runs in f32 on both sides (the shipped dtype); tolerances
grow linearly with step index to absorb sum-order rounding compounding
through the trajectory.
"""

import unittest

import numpy as np

import jax
import jax.numpy as jnp
import pytest

import ref_torch

pytestmark = pytest.mark.slow

HW = (96, 128)
N_STEPS = 12
N_BATCHES = 4  # distinct synthetic batches, cycled


def _make_batches(rng):
    """Synthetic batches with 2 well-separated GT boxes each."""
    h, w = HW
    batches = []
    for _ in range(N_BATCHES):
        image = rng.normal(0.0, 1.0, (1, h, w, 3)).astype(np.float32)
        # boxes jittered around two fixed, well-separated placements so
        # every batch has a healthy candidate pool on several levels
        j = rng.uniform(-4.0, 4.0, size=8)
        boxes = np.asarray(
            [[[10.0 + j[0], 12.0 + j[1], 70.0 + j[2], 60.0 + j[3]],
              [52.0 + j[4], 34.0 + j[5], 118.0 + j[6], 88.0 + j[7]]]],
            np.float32,
        )
        labels = rng.randint(1, 81, size=(1, 2)).astype(np.int32)
        batches.append((image, boxes, labels))
    return batches


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestTrainTrajectoryParity(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        import torch

        cls.torch = torch
        cls.ref_model, cls.ref_cfg = ref_torch.build_reference_model()
        ev = cls.ref_model.rpn.loss_evaluator
        ev.cls_loss_func.gamma = [cls.ref_cfg.MODEL.PAA.LOSS_GAMMA]
        ev.cls_loss_func.alpha = [cls.ref_cfg.MODEL.PAA.LOSS_ALPHA]
        cls.state = ref_torch.randomize_state_dict(cls.ref_model, seed=11)

        from paa_tpu.config import get_cfg
        from paa_tpu.modeling import build_detection_model
        from paa_tpu.utils.torch_import import load_torch_state_dict

        cfg = get_cfg()
        cfg.merge_from_file("configs/paa/paa_R_50_FPN_1x.yaml")
        cfg.MODEL.WEIGHT = ""
        cls.cfg = cfg
        cls.flax_model = build_detection_model(cfg)
        variables = cls.flax_model.init(jax.random.PRNGKey(0), HW)
        cls.params0 = load_torch_state_dict(variables["params"], cls.state)

        cls.batches = _make_batches(np.random.RandomState(41))

    def _run_reference(self):
        """N reference train steps; returns (losses[t], pos_sets[t],
        final_state_dict)."""
        torch = self.torch
        from paa_core.solver import make_lr_scheduler, make_optimizer
        from paa_core.structures.bounding_box import BoxList
        from paa_core.structures.image_list import to_image_list

        model = self.ref_model
        model.train()
        opt = make_optimizer(self.ref_cfg, model)
        sched = make_lr_scheduler(self.ref_cfg, opt)

        ev = model.rpn.loss_evaluator
        pos_sets = []
        orig_compute_paa = ev.compute_paa

        def hooked(*a, **k):
            labels, reg_targets = orig_compute_paa(*a, **k)
            flat = torch.cat(labels, dim=0).detach().numpy()
            pos_sets.append(frozenset(np.nonzero(flat > 0)[0].tolist()))
            return labels, reg_targets

        ev.compute_paa = hooked
        try:
            losses_per_step = []
            for t in range(N_STEPS):
                image, boxes, labels = self.batches[t % N_BATCHES]
                x = torch.as_tensor(np.transpose(image, (0, 3, 1, 2)))
                images = to_image_list([x[0]], 32)
                target = BoxList(
                    torch.as_tensor(boxes[0]), (HW[1], HW[0]), mode="xyxy"
                )
                target.add_field(
                    "labels", torch.as_tensor(labels[0].astype(np.int64))
                )
                opt.zero_grad()
                ld = model(images, [target])
                sum(ld.values()).backward()
                opt.step()
                sched.step()
                losses_per_step.append(
                    {k: float(v.detach()) for k, v in ld.items()}
                )
        finally:
            ev.compute_paa = orig_compute_paa
        final = {
            k: v.detach().numpy().copy()
            for k, v in model.state_dict().items()
        }
        return losses_per_step, pos_sets, final

    def _run_ours(self):
        import optax

        from paa_tpu.modeling.paa_loss import PAALossConfig, paa_loss
        from paa_tpu.solver.build import make_optimizer

        anchors, counts = self.flax_model.anchors_for(HW)
        lcfg = PAALossConfig.from_cfg(self.cfg)
        anchors_j = jnp.asarray(anchors)
        module = self.flax_model.module

        tx, _labels = make_optimizer(self.cfg, self.params0)

        @jax.jit
        def step(params, opt_state, img, gtb, gtl):
            def total_fn(p):
                out = module.apply({"params": p}, img)
                losses, aux = paa_loss(
                    out, gtb, gtl, anchors_j, counts, lcfg,
                    return_aux=True,
                )
                total = (losses["loss_cls"] + losses["loss_reg"]
                         + losses["loss_iou_pred"])
                return total, (losses, aux["pos_mask"])

            (_, (losses, pos_mask)), grads = jax.value_and_grad(
                total_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses, pos_mask

        params = self.params0
        opt_state = tx.init(params)
        losses_per_step, pos_sets = [], []
        for t in range(N_STEPS):
            image, boxes, labels = self.batches[t % N_BATCHES]
            params, opt_state, losses, pos_mask = step(
                params, opt_state, jnp.asarray(image),
                jnp.asarray(boxes), jnp.asarray(labels),
            )
            losses_per_step.append(
                {k: float(v) for k, v in losses.items()
                 if k.startswith("loss")}
            )
            flat = np.asarray(pos_mask).reshape(-1)
            pos_sets.append(frozenset(np.nonzero(flat)[0].tolist()))
        return losses_per_step, pos_sets, params

    def test_trajectory_matches(self):
        ref_losses, ref_pos, ref_final = self._run_reference()
        our_losses, our_pos, our_params = self._run_ours()

        # ---- per-step positive-assignment sets: exact equality -------
        for t in range(N_STEPS):
            self.assertEqual(
                our_pos[t], ref_pos[t],
                msg=(f"step {t}: positive sets diverge "
                     f"(ours-only {sorted(our_pos[t] - ref_pos[t])[:5]}, "
                     f"ref-only {sorted(ref_pos[t] - our_pos[t])[:5]})"),
            )

        # ---- per-step loss trajectories -------------------------------
        for t in range(N_STEPS):
            rtol = 3e-4 * (1 + t)  # rounding compounds along the path
            for key in ("loss_cls", "loss_reg", "loss_iou_pred"):
                np.testing.assert_allclose(
                    our_losses[t][key], ref_losses[t][key], rtol=rtol,
                    err_msg=f"step {t} {key}",
                )

        # ---- final params: cumulative delta of every trainable tensor -
        from paa_tpu.utils.torch_import import (
            _apply_transform,
            torch_name_to_flax_path,
        )

        checked, failures = 0, []
        for name, p in self.ref_model.named_parameters():
            if not p.requires_grad:
                continue
            mapping = torch_name_to_flax_path(name)
            self.assertIsNotNone(mapping, name)
            path, kind = mapping
            new = our_params
            old = self.params0
            for k in path:
                new = new[k]
                old = old[k]
            ref_new = _apply_transform(ref_final[name], kind, 7)
            old64 = np.asarray(old, np.float64)
            ours_delta = np.asarray(new, np.float64) - old64
            ref_delta = np.asarray(ref_new, np.float64) - old64
            scale = max(
                np.abs(ref_delta).max(), np.abs(ours_delta).max(), 1e-12
            )
            # f32 weight-storage quantization floor (see the one-step
            # test): each side rounds params to f32 after every step
            quant = 4 * N_STEPS * 1.2e-7 * max(np.abs(old64).max(), 1e-12)
            err = np.abs(ours_delta - ref_delta).max()
            frozen_ref = not np.any(ref_delta)
            frozen_ours = not np.any(ours_delta)
            checked += 1
            if frozen_ref != frozen_ours:
                failures.append((name, "freeze mismatch"))
            elif not frozen_ref and err > 5e-3 * scale + quant:
                failures.append((name, float(err / scale)))
        self.assertGreaterEqual(checked, 101)
        self.assertEqual(failures, [])


if __name__ == "__main__":
    unittest.main()
