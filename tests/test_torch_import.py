"""Weight-import fidelity: reference torch model vs flax model.

SURVEY.md lists weight-import fidelity among the top hard parts
("mistakes here silently cost AP", §7). These tests build the actual
reference torch model on CPU (reference
paa_core/modeling/detector/generalized_rcnn.py via tests/ref_torch.py
shims), randomize every parameter AND buffer, import the state dict with
``utils/torch_import.py``, and assert the two models produce the same
backbone feature maps and head outputs on the same image. Any wrong regex
in ``torch_name_to_flax_path``, wrong transpose, or wrong BN semantics
fails these assertions.

Also covers the Detectron ``.pkl`` path (``load_c2_pickle``) with a
synthetic pickle generated from the same torch model's backbone body
(naming per reference paa_core/utils/c2_model_loading.py, inverted).
"""

import pickle
import unittest

import numpy as np

import jax.numpy as jnp

from paa_tpu.config import get_cfg
from paa_tpu.modeling import build_detection_model
from paa_tpu.utils.torch_import import (
    load_c2_pickle,
    load_torch_state_dict,
)

import ref_torch
import pytest

# full-model compiles: minutes cold on the CPU test runner
pytestmark = pytest.mark.slow

HW = (128, 160)


def _flax_flagship():
    cfg = get_cfg()
    cfg.merge_from_file("configs/paa/paa_R_50_FPN_1x.yaml")
    cfg.MODEL.WEIGHT = ""
    model = build_detection_model(cfg)
    import jax

    variables = model.init(jax.random.PRNGKey(0), HW)
    return model, variables


@unittest.skipUnless(
    ref_torch.reference_available(), "reference checkout not present"
)
class TestTorchImportParity(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        import torch

        cls.torch = torch
        cls.ref_model, _ = ref_torch.build_reference_model()
        cls.state = ref_torch.randomize_state_dict(cls.ref_model, seed=7)
        cls.flax_model, cls.variables = _flax_flagship()

        rng = np.random.RandomState(3)
        cls.image = rng.normal(0.0, 1.0, (1, *HW, 3)).astype(np.float32)

        with torch.no_grad():
            x = torch.as_tensor(
                np.transpose(cls.image, (0, 3, 1, 2))
            )
            cls.ref_feats = cls.ref_model.backbone(x)
            cls.ref_cls, cls.ref_reg, cls.ref_iou = cls.ref_model.rpn.head(
                cls.ref_feats
            )
            # the reference multiplies Scale into bbox_pred inside the head
            # (paa.py:103-107), so ref_reg is already scaled.

    def test_all_reference_keys_map(self):
        """Every state-dict tensor except anchor buffers must map."""
        unmapped = [
            k
            for k in self.state
            if "anchor_generator" not in k
            and __import__(
                "paa_tpu.utils.torch_import", fromlist=["x"]
            ).torch_name_to_flax_path(k)
            is None
        ]
        self.assertEqual(unmapped, [])

    def _imported_params(self):
        return load_torch_state_dict(self.variables["params"], self.state)

    def test_backbone_feature_parity(self):
        params = self._imported_params()
        feats = self.flax_model.module.apply(
            {"params": params},
            jnp.asarray(self.image),
            method=lambda m, x: m.backbone(x),
        )
        self.assertEqual(len(feats), len(self.ref_feats))
        for lvl, (ours, ref) in enumerate(zip(feats, self.ref_feats)):
            ref_nhwc = np.transpose(ref.detach().numpy(), (0, 2, 3, 1))
            self.assertEqual(ours.shape, ref_nhwc.shape, f"level {lvl}")
            np.testing.assert_allclose(
                np.asarray(ours), ref_nhwc, atol=1e-4, rtol=1e-4,
                err_msg=f"backbone level {lvl}",
            )

    def test_head_output_parity(self):
        params = self._imported_params()
        out = self.flax_model.module.apply(
            {"params": params}, jnp.asarray(self.image)
        )
        ref_cls = np.concatenate(
            [ref_torch.permute_and_flatten(t, 1, 80) for t in self.ref_cls],
            axis=1,
        )
        ref_reg = np.concatenate(
            [ref_torch.permute_and_flatten(t, 1, 4) for t in self.ref_reg],
            axis=1,
        )
        ref_iou = np.concatenate(
            [ref_torch.permute_and_flatten(t, 1, 1) for t in self.ref_iou],
            axis=1,
        )[..., 0]
        np.testing.assert_allclose(
            np.asarray(out["cls_logits"]), ref_cls, atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["box_regression"]), ref_reg, atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["iou_pred"]), ref_iou, atol=1e-4, rtol=1e-4
        )

    def test_c2_pickle_backbone_parity(self, tmp="/tmp/_paa_c2_test.pkl"):
        """Synthetic Detectron pickle -> load_c2_pickle -> same features.

        C2 pickles carry pre-folded BN (s/b only, stats implicitly 0/1),
        so fold the randomized running stats into s/b before export; the
        torch reference output is recomputed with folded stats so both
        sides represent the same function.
        """
        torch = self.torch
        folded = dict(self.state)
        # fold each body FrozenBN (scale' = w/sqrt(rv), bias' = b - rm*scale')
        for k in list(self.state):
            if not (k.startswith("backbone.body.") and k.endswith(".running_mean")):
                continue
            base = k.rsplit(".", 1)[0]
            w = self.state[base + ".weight"]
            b = self.state[base + ".bias"]
            rm = self.state[base + ".running_mean"]
            rv = self.state[base + ".running_var"]
            scale = w / np.sqrt(rv)  # reference FrozenBN: no epsilon
            folded[base + ".weight"] = scale.astype(w.dtype)
            folded[base + ".bias"] = (b - rm * scale).astype(b.dtype)
            folded[base + ".running_mean"] = np.zeros_like(rm)
            folded[base + ".running_var"] = np.ones_like(rv)
        blobs = {}
        for k, v in folded.items():
            if not k.startswith("backbone.body."):
                continue
            name = ref_torch.torch_key_to_c2_name(k)
            if name is not None:  # running stats: no blob in c2 pickles
                blobs[name] = np.asarray(v)
        with open(tmp, "wb") as f:
            pickle.dump({"blobs": blobs}, f)

        # flax: torch-import everything BUT the backbone body, then fill
        # the body solely from the pickle — a body mapping error cannot
        # be masked by the torch import.
        no_body = {
            k: v for k, v in self.state.items()
            if not k.startswith("backbone.body.")
        }
        params = load_torch_state_dict(self.variables["params"], no_body)
        params = load_c2_pickle(params, tmp)

        self.ref_model.load_state_dict(
            {k: torch.as_tensor(v) for k, v in folded.items()}
        )
        with torch.no_grad():
            x = torch.as_tensor(np.transpose(self.image, (0, 3, 1, 2)))
            ref_feats = self.ref_model.backbone(x)
        feats = self.flax_model.module.apply(
            {"params": params},
            jnp.asarray(self.image),
            method=lambda m, x: m.backbone(x),
        )
        for lvl, (ours, ref) in enumerate(zip(feats, ref_feats)):
            ref_nhwc = np.transpose(ref.detach().numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(
                np.asarray(ours), ref_nhwc, atol=1e-4, rtol=1e-4,
                err_msg=f"c2-imported backbone level {lvl}",
            )
        # restore the un-folded weights for other tests
        self.ref_model.load_state_dict(
            {k: torch.as_tensor(v) for k, v in self.state.items()}
        )


if __name__ == "__main__":
    unittest.main()
