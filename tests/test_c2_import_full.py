"""Caffe2Detectron full-surface pickle import + dcnv2 torch import.

Round-3 extensions of the weight-import proof:

1. ``load_c2_pickle`` now covers the FULL Caffe2Detectron/COCO surface
   (FPN laterals/outputs, classic RPN head, box/mask/keypoint ROI
   heads), not just ImageNet backbones. Proof: build the actual
   reference Mask/Keypoint R-CNN torch model, randomize it, synthesize
   a Detectron-named pickle from its state dict (inverse rename in
   tests/ref_torch.py, mirroring c2_model_loading.py backwards), and
   assert that importing the pickle lands tensor-for-tensor on the same
   leaves as importing the torch state dict — whole-tree equality.

2. ``load_torch_state_dict`` maps DCN weights (DFConv2d's .conv /
   .offset children, layers/misc.py:113-185) for both backbone
   bottlenecks (resnet.py:286-300) and head towers (rpn/paa/paa.py:
   27-29). Proof: build the reference PAA model with modulated DCN
   stages + DCN tower (paa_dcnv2_* configs shrunk to R-50), randomize,
   import, and compare backbone features + head outputs. The reference
   side's CUDA-only deform conv is routed through our JAX kernel
   (tests/ref_torch.py _patch_dcn_cpu) — this pins the offset-conv and
   deform-kernel LAYOUT mapping; the kernel's arithmetic is pinned
   independently in tests/test_dcn.py against a numpy transcription of
   deform_conv_kernel_cuda.cu.
"""

import pickle
import unittest

import numpy as np

import jax
import jax.numpy as jnp
import pytest

import ref_torch

# full-model builds/compiles: minutes cold on the 1-core CPU runner
pytestmark = pytest.mark.slow

HW = (96, 128)

_DCN_OPTS = [
    "MODEL.RESNETS.STAGE_WITH_DCN", "(False, True, True, True)",
    "MODEL.RESNETS.WITH_MODULATED_DCN", "True",
    "MODEL.RESNETS.DEFORMABLE_GROUPS", "1",
    "MODEL.PAA.USE_DCN_IN_TOWER", "True",
]


def _flax_model(config, opts=()):
    from paa_tpu.config import get_cfg
    from paa_tpu.modeling import build_detection_model

    cfg = get_cfg()
    cfg.merge_from_file(config)
    if opts:
        cfg.merge_from_list(list(opts))
    cfg.MODEL.WEIGHT = ""
    model = build_detection_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), HW)
    return model, variables


def _fold_frozen_bn(state):
    """C2 pickles carry pre-folded BN (s/b only, stats implicitly 0/1):
    fold the randomized running stats into weight/bias so the pickle
    and the torch state dict describe the same function."""
    folded = dict(state)
    for k in list(state):
        if not k.endswith(".running_mean"):
            continue
        base = k.rsplit(".", 1)[0]
        w, b = state[base + ".weight"], state[base + ".bias"]
        rm, rv = state[k], state[base + ".running_var"]
        scale = w / np.sqrt(rv)  # reference FrozenBN: no epsilon
        folded[base + ".weight"] = scale.astype(w.dtype)
        folded[base + ".bias"] = (b - rm * scale).astype(b.dtype)
        folded[k] = np.zeros_like(rm)
        folded[base + ".running_var"] = np.ones_like(rv)
    return folded


def _tree_leaves(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _tree_leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), v


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestC2DetectionImport(unittest.TestCase):
    """load_c2_pickle(detection pickle) == load_torch_state_dict."""

    def _roundtrip(self, config, tmp):
        from paa_tpu.utils.torch_import import (
            load_c2_pickle,
            load_torch_state_dict,
        )

        ref_model, _ = ref_torch.build_reference_model(
            f"configs/{config}"
        )
        state = ref_torch.randomize_state_dict(ref_model, seed=11)
        folded = _fold_frozen_bn(state)

        blobs, unnamed = {}, []
        for k, v in folded.items():
            if "anchor_generator" in k or k.endswith(
                ("running_mean", "running_var")
            ):
                continue
            name = ref_torch.torch_key_to_c2_detection_name(k)
            if name is None:
                unnamed.append(k)
                continue
            blobs[name] = np.asarray(v)
        # every parameter of these models must have a Detectron name —
        # an unnamed leak means the inverse rename (and so the test's
        # coverage) is incomplete
        self.assertEqual(unnamed, [])
        with open(tmp, "wb") as f:
            pickle.dump({"blobs": blobs}, f)

        _, variables = _flax_model(f"/root/reference/configs/{config}")
        via_torch = load_torch_state_dict(variables["params"], folded)
        via_c2 = load_c2_pickle(variables["params"], tmp)

        torch_leaves = dict(_tree_leaves(via_torch))
        c2_leaves = dict(_tree_leaves(via_c2))
        self.assertEqual(
            sorted(torch_leaves), sorted(c2_leaves)
        )
        for path, v in torch_leaves.items():
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(c2_leaves[path]),
                err_msg="/".join(path),
            )

    def test_mask_rcnn_fpn_roundtrip(self):
        self._roundtrip(
            "e2e_mask_rcnn_R_50_FPN_1x.yaml", "/tmp/_paa_c2_mask.pkl"
        )

    def test_keypoint_rcnn_fpn_roundtrip(self):
        self._roundtrip(
            "e2e_keypoint_rcnn_R_50_FPN_1x.yaml", "/tmp/_paa_c2_kps.pkl"
        )


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestDcnv2ImportParity(unittest.TestCase):
    """Randomized reference PAA-dcnv2 (R-50-shaped) -> import -> same
    backbone features and head outputs."""

    OPTS = _DCN_OPTS

    @classmethod
    def setUpClass(cls):
        import torch

        cls.torch = torch
        cls.ref_model, _ = ref_torch.build_reference_model(
            "configs/paa/paa_R_50_FPN_1x.yaml", opts=cls.OPTS
        )
        cls.state = ref_torch.randomize_state_dict(cls.ref_model, seed=5)
        cls.flax_model, cls.variables = _flax_model(
            "configs/paa/paa_R_50_FPN_1x.yaml", opts=cls.OPTS
        )
        rng = np.random.RandomState(9)
        cls.image = rng.normal(0.0, 1.0, (1, *HW, 3)).astype(np.float32)
        with torch.no_grad():
            x = torch.as_tensor(np.transpose(cls.image, (0, 3, 1, 2)))
            cls.ref_feats = cls.ref_model.backbone(x)
            cls.ref_cls, cls.ref_reg, cls.ref_iou = (
                cls.ref_model.rpn.head(cls.ref_feats)
            )

    def test_all_dcn_keys_map(self):
        from paa_tpu.utils.torch_import import torch_name_to_flax_path

        dcn_keys = [
            k for k in self.state
            if ".conv2.conv." in k or ".offset." in k
        ]
        self.assertTrue(dcn_keys)  # the DCN config must produce them
        unmapped = [
            k for k in dcn_keys if torch_name_to_flax_path(k) is None
        ]
        self.assertEqual(unmapped, [])

    def test_backbone_and_head_parity(self):
        from paa_tpu.utils.torch_import import load_torch_state_dict

        params = load_torch_state_dict(
            self.variables["params"], self.state
        )
        feats = self.flax_model.module.apply(
            {"params": params},
            jnp.asarray(self.image),
            method=lambda m, x: m.backbone(x),
        )
        for lvl, (ours, ref) in enumerate(zip(feats, self.ref_feats)):
            ref_nhwc = np.transpose(ref.detach().numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(
                np.asarray(ours), ref_nhwc, atol=2e-4, rtol=1e-4,
                err_msg=f"dcnv2 backbone level {lvl}",
            )
        out = self.flax_model.module.apply(
            {"params": params}, jnp.asarray(self.image)
        )
        ref_cls = np.concatenate(
            [
                ref_torch.permute_and_flatten(t, 1, 80)
                for t in self.ref_cls
            ],
            axis=1,
        )
        ref_reg = np.concatenate(
            [
                ref_torch.permute_and_flatten(t, 1, 4)
                for t in self.ref_reg
            ],
            axis=1,
        )
        np.testing.assert_allclose(
            np.asarray(out["cls_logits"]), ref_cls, atol=2e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["box_regression"]), ref_reg,
            atol=2e-4, rtol=1e-4,
        )


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestDcnv2ResNeXtImportParity(TestDcnv2ImportParity):
    """North-star config 4 shape (paa_dcnv2_X_101_*): grouped
    bottleneck convs (ResNeXt NUM_GROUPS/WIDTH_PER_GROUP,
    resnet.py:98-101) combined with modulated DCN — pins the grouped
    deform-kernel layout on import. R-50 depth keeps the CPU cost
    sane; the group mechanics are identical at X-101 scale.

    DEFORMABLE_GROUPS stays 1: the reference's own DFConv2d mis-splits
    the offset/mask channels for dg > 1 (split at offset_base*2
    regardless of dg, layers/misc.py:178-183 — no reference config
    sets dg > 1, so the bug is latent upstream), which makes
    parity-vs-reference unrunnable; our dg > 1 semantics are pinned
    against the numpy transcription of the CUDA kernel in
    tests/test_dcn.py instead."""

    OPTS = _DCN_OPTS + [
        "MODEL.RESNETS.NUM_GROUPS", "4",
        "MODEL.RESNETS.WIDTH_PER_GROUP", "16",
    ]
