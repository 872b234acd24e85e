"""Weight-import fidelity for the TWO-STAGE models (RPN + ROI heads).

Extends test_torch_import.py's dense-model proof to the Mask R-CNN /
Keypoint R-CNN weight surface: build the ACTUAL reference torch model
(configs/e2e_mask_rcnn_R_50_FPN_1x.yaml /
e2e_keypoint_rcnn_R_50_FPN_1x.yaml via tests/ref_torch.py), randomize
every parameter and buffer, import with utils/torch_import.py, and
assert our model reproduces the reference's RPN and ROI-head outputs on
identical features and proposals. This pins:

- the classic RPN head mapping (rpn/rpn.py:90-94 conv/cls_logits/
  bbox_pred),
- fc6's NCHW->NHWC flatten-order column permutation
  (roi_box_feature_extractors.py:76-78 x.view vs our NHWC reshape),
- Linear (out, in) -> Dense (in, out) transposes for fc7 and the
  cls_score/bbox_pred predictors (roi_box_predictors.py:41-43),
- ConvTranspose2d -> flax ConvTranspose kernel layout + spatial flip
  (roi_mask_predictors.py:18, roi_keypoint_predictors.py:14),
- the mask_fcn_logits background-channel drop (our predictors emit C-1
  foreground channels; the reference's channel 0 is never used),
- the reference Pooler + LevelMapper level routing vs our
  multilevel_roi_align (modeling/poolers.py:11-124). NOTE: the
  reference side's _C.roi_align_forward is shimmed with OUR JAX
  kernel (tests/ref_torch.py), so the ROIAlign arithmetic itself is
  not independently re-proven here — that is tests/test_roi_align.py
  (legacy aligned=False golden semantics); what this file pins is the
  level assignment and everything downstream of pooling.
"""

import unittest

import numpy as np

import jax
import jax.numpy as jnp
import pytest

import ref_torch

# full-model compiles: minutes cold on the 1-core CPU test runner
pytestmark = pytest.mark.slow

HW = (96, 128)


def _flax_two_stage(config="e2e_mask_rcnn_R_50_FPN_1x.yaml"):
    from paa_tpu.config import get_cfg
    from paa_tpu.modeling import build_detection_model

    cfg = get_cfg()
    cfg.merge_from_file(f"/root/reference/configs/{config}")
    cfg.MODEL.WEIGHT = ""
    model = build_detection_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), HW)
    return model, variables


def _boxlist_proposals(torch, rois, scores=None):
    """Proposals as the reference BoxList (one image)."""
    from paa_core.structures.bounding_box import BoxList

    bl = BoxList(torch.as_tensor(rois), (HW[1], HW[0]), mode="xyxy")
    if scores is not None:
        bl.add_field("objectness", torch.as_tensor(scores))
    return bl


def _rois(seed, n=8):
    rng = np.random.RandomState(seed)
    rois = []
    for _ in range(n):
        x = np.sort(rng.uniform(4, HW[1] - 12, 2) + [0, 8])
        y = np.sort(rng.uniform(4, HW[0] - 12, 2) + [0, 8])
        rois.append([x[0], y[0], x[1], y[1]])
    return np.asarray(rois, np.float32)


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestMaskRCNNImportParity(unittest.TestCase):
    CONFIG = "e2e_mask_rcnn_R_50_FPN_1x.yaml"

    @classmethod
    def setUpClass(cls):
        import torch

        cls.torch = torch
        cls.ref_model, _ = ref_torch.build_reference_model(
            f"configs/{cls.CONFIG}"
        )
        cls.state = ref_torch.randomize_state_dict(cls.ref_model, seed=11)
        cls.flax_model, cls.variables = _flax_two_stage(cls.CONFIG)

        from paa_tpu.utils.torch_import import load_torch_state_dict

        cls.params = load_torch_state_dict(
            cls.variables["params"], cls.state
        )

        rng = np.random.RandomState(5)
        cls.image = rng.normal(0.0, 1.0, (1, *HW, 3)).astype(np.float32)
        with torch.no_grad():
            x = torch.as_tensor(np.transpose(cls.image, (0, 3, 1, 2)))
            cls.ref_feats = cls.ref_model.backbone(x)
        cls.flax_feats = cls.flax_model.module.apply(
            {"params": cls.params},
            jnp.asarray(cls.image),
            method=lambda m, x: m.backbone(x),
        )
        cls.rois = _rois(6)

    def test_all_two_stage_keys_map(self):
        from paa_tpu.utils.torch_import import (
            torch_name_to_flax_path,
            two_stage_name_candidates,
        )

        import re

        # same pre-scan as load_torch_state_dict: the xconvs Sequential
        # layout is ambiguous from a single key
        xconv_gn = any(
            re.search(r"\.xconvs\.1\.weight$", k) for k in self.state
        )
        unmapped = []
        for k in self.state:
            if "anchor_generator" in k:
                continue
            if (
                torch_name_to_flax_path(k) is None
                and not two_stage_name_candidates(k, xconv_gn)
            ):
                unmapped.append(k)
        self.assertEqual(unmapped, [])

    def test_backbone_features_match(self):
        for lvl, ref in enumerate(self.ref_feats):
            ours = np.asarray(self.flax_feats[lvl])
            ref = ref.numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(
                ours, ref, rtol=2e-4, atol=2e-4,
                err_msg=f"FPN level {lvl}",
            )

    def test_rpn_head_outputs_match(self):
        torch = self.torch
        with torch.no_grad():
            ref_obj, ref_reg = self.ref_model.rpn.head(self.ref_feats)
        out = self.flax_model.module.apply(
            {"params": self.params},
            self.flax_feats,
            method=lambda m, f: m.rpn_head(f),
        )
        # ours returns concatenated (B, sum HWA) / (B, sum HWA, 4) in
        # NHWC-flatten order (h, w, a); reference is per-level NCHW
        # (B, A, H, W) / (B, 4A, H, W)
        ours_obj = np.asarray(out["objectness"])[0]
        ours_reg = np.asarray(out["box_regression"])[0]
        off = 0
        for lvl, o in enumerate(ref_obj):
            b, a, h, w = o.shape
            n = h * w * a
            ref_o = (
                o.numpy().transpose(0, 2, 3, 1).reshape(-1)
            )  # (h, w, a)
            np.testing.assert_allclose(
                ours_obj[off:off + n], ref_o, rtol=1e-4, atol=1e-5,
                err_msg=f"objectness level {lvl}",
            )
            r = ref_reg[lvl].numpy().reshape(b, a, 4, h, w)
            ref_r = r.transpose(0, 3, 4, 1, 2).reshape(-1, 4)
            np.testing.assert_allclose(
                ours_reg[off:off + n], ref_r, rtol=1e-4, atol=1e-5,
                err_msg=f"box_regression level {lvl}",
            )
            off += n
        self.assertEqual(off, ours_obj.shape[0])

    def test_box_head_matches(self):
        torch = self.torch
        prop = _boxlist_proposals(torch, self.rois)
        with torch.no_grad():
            fx = self.ref_model.roi_heads.box.feature_extractor(
                self.ref_feats, [prop]
            )
            ref_cls, ref_reg = self.ref_model.roi_heads.box.predictor(fx)
        cls_logits, box_deltas = self.flax_model.module.apply(
            {"params": self.params},
            self.flax_feats,
            jnp.asarray(self.rois),
            jnp.zeros((len(self.rois),), jnp.int32),
            method=type(self.flax_model.module).box,
        )
        np.testing.assert_allclose(
            np.asarray(cls_logits), ref_cls.numpy(),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(box_deltas).reshape(len(self.rois), -1),
            ref_reg.numpy(), rtol=2e-4, atol=2e-4,
        )

    def test_mask_head_matches(self):
        torch = self.torch
        prop = _boxlist_proposals(torch, self.rois)
        with torch.no_grad():
            mx = self.ref_model.roi_heads.mask.feature_extractor(
                self.ref_feats, [prop]
            )
            ref_logits = self.ref_model.roi_heads.mask.predictor(mx)
        ours = self.flax_model.module.apply(
            {"params": self.params},
            self.flax_feats,
            jnp.asarray(self.rois),
            jnp.zeros((len(self.rois),), jnp.int32),
            method=type(self.flax_model.module).mask,
        )
        # ours: (R, 28, 28, C-1); reference: (R, C, 28, 28) with
        # channel 0 = unused background
        ref = ref_logits.numpy()[:, 1:].transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(ours), ref, rtol=2e-4, atol=2e-4,
        )


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestMaskRCNNGNImportParity(TestMaskRCNNImportParity):
    """Same proof on the GN baseline (gn_baselines/
    e2e_mask_rcnn_R_50_FPN_Xconv1fc_1x_gn.yaml): GroupNorm stem +
    bottlenecks (StemWithGN/BottleneckWithGN with STRIDE_IN_1X1
    False), GN FPN (Sequential(conv, GN) -> fpn_inner1.0.weight
    keys), the FPNXconv1fc box head with GN xconvs, and the GN mask
    head — every GN key-mapping branch of the importer, numerically."""

    CONFIG = "gn_baselines/e2e_mask_rcnn_R_50_FPN_Xconv1fc_1x_gn.yaml"


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestKeypointRCNNImportParity(unittest.TestCase):
    def test_keypoint_head_matches(self):
        import torch

        ref_model, _ = ref_torch.build_reference_model(
            "configs/e2e_keypoint_rcnn_R_50_FPN_1x.yaml"
        )
        state = ref_torch.randomize_state_dict(ref_model, seed=12)
        flax_model, variables = _flax_two_stage(
            "e2e_keypoint_rcnn_R_50_FPN_1x.yaml"
        )
        from paa_tpu.utils.torch_import import load_torch_state_dict

        params = load_torch_state_dict(variables["params"], state)

        rng = np.random.RandomState(7)
        image = rng.normal(0.0, 1.0, (1, *HW, 3)).astype(np.float32)
        rois = _rois(8)
        with torch.no_grad():
            x = torch.as_tensor(np.transpose(image, (0, 3, 1, 2)))
            ref_feats = ref_model.backbone(x)
            prop = _boxlist_proposals(torch, rois)
            kx = ref_model.roi_heads.keypoint.feature_extractor(
                ref_feats, [prop]
            )
            ref_logits = ref_model.roi_heads.keypoint.predictor(kx)
        flax_feats = flax_model.module.apply(
            {"params": params},
            jnp.asarray(image),
            method=lambda m, x: m.backbone(x),
        )
        ours = flax_model.module.apply(
            {"params": params},
            flax_feats,
            jnp.asarray(rois),
            jnp.zeros((len(rois),), jnp.int32),
            method=type(flax_model.module).keypoint,
        )
        ref = ref_logits.numpy().transpose(0, 2, 3, 1)
        # atol 5e-3 on logits of magnitude ~1e2-4e2: torch interpolate
        # and jax.image.resize accumulate the x2 bilinear sum in
        # different orders (observed max |diff| 3e-3 on 0.4% of
        # elements; a grid-convention mismatch would be ~% of value)
        np.testing.assert_allclose(
            np.asarray(ours), ref, rtol=2e-4, atol=5e-3,
        )


if __name__ == "__main__":
    unittest.main()
