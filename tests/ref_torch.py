"""Load the reference torch model (/root/reference) on CPU for parity tests.

The reference is maskrcnn-benchmark-era code: it needs ``yacs`` (absent —
we substitute our behaviour-compatible CfgNode), the compiled CUDA module
``paa_core._C`` (absent — we substitute a lazy-failing stub; the PAA R50
forward path never calls into it when post-processing is not run), and the
removed ``np.float`` alias.

Only parity tests import this module; it mutates sys.modules/sys.path.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "paa_core"))


def install_shims() -> None:
    if not hasattr(np, "float"):
        np.float = float  # removed alias, used by reference anchor math
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "yacs" not in sys.modules:
        from paa_tpu.config.cfg_node import CfgNode

        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config
    if "pycocotools" not in sys.modules:
        # the reference's SegmentationMask rasterizes polygons through
        # pycocotools.mask (segmentation_mask.py:294-296); our
        # from-scratch RLE module provides the same three entry points
        from paa_tpu.evaluation import mask_rle

        def _frPyObjects(pyobj, h, w):
            if len(pyobj) and not isinstance(
                pyobj[0], (list, tuple, np.ndarray)
            ):
                pyobj = [pyobj]  # single flat polygon
            return [mask_rle.polygons_to_rle([p], h, w) for p in pyobj]

        def _merge(rles):
            m = None
            for r in rles:
                d = mask_rle.decode(r)
                m = d if m is None else np.maximum(m, d)
            return mask_rle.encode(m)

        pyco = types.ModuleType("pycocotools")
        pyco_mask = types.ModuleType("pycocotools.mask")
        pyco_mask.frPyObjects = _frPyObjects
        pyco_mask.merge = _merge
        pyco_mask.decode = lambda rle: mask_rle.decode(rle).astype(
            np.uint8
        )
        pyco.mask = pyco_mask
        sys.modules["pycocotools"] = pyco
        sys.modules["pycocotools.mask"] = pyco_mask
    if "paa_core._C" not in sys.modules:

        def _py_nms(boxes, scores, threshold):
            """Pure-torch greedy NMS with the +1 IoU convention
            (csrc/cpu/nms_cpu.cpp semantics)."""
            import torch

            order = torch.argsort(scores, descending=True)
            keep = []
            suppressed = torch.zeros(len(boxes), dtype=torch.bool)
            areas = (
                (boxes[:, 2] - boxes[:, 0] + 1)
                * (boxes[:, 3] - boxes[:, 1] + 1)
            )
            for i in order.tolist():
                if suppressed[i]:
                    continue
                keep.append(i)
                lt = torch.maximum(boxes[i, :2], boxes[:, :2])
                rb = torch.minimum(boxes[i, 2:], boxes[:, 2:])
                wh = (rb - lt + 1).clamp(min=0)
                inter = wh[:, 0] * wh[:, 1]
                iou = inter / (areas[i] + areas - inter)
                suppressed |= iou > threshold
            return torch.as_tensor(keep, dtype=torch.long)

        def _py_ml_nms(boxes, scores, labels, threshold):
            """Class-aware NMS: offset boxes per label so cross-class
            IoU is 0 (ml_nms.cu:13-15 semantics). float64: an f32
            coordinate offset by label*1e5 loses sub-pixel precision
            and changes IoUs."""
            offset = labels.double().reshape(-1, 1) * 100000.0
            return _py_nms(boxes.double() + offset, scores, threshold)

        class _CStub(types.ModuleType):
            """Raises on CUDA-only ops; provides real python nms/ml_nms
            so the reference post-processing runs on CPU."""

            nms = staticmethod(_py_nms)
            ml_nms = staticmethod(_py_ml_nms)

            def __getattr__(self, name):
                if name.startswith("__"):
                    raise AttributeError(name)

                def _fail(*a, **k):
                    raise RuntimeError(f"paa_core._C.{name} stub called")

                return _fail

        sys.modules["paa_core._C"] = _CStub("paa_core._C")


def build_reference_model(config_file: str = "configs/paa/paa_R_50_FPN_1x.yaml"):
    """Build the reference torch detection model on CPU (eval mode)."""
    install_shims()
    from paa_core.config import cfg as ref_cfg

    if ref_cfg.is_frozen():
        ref_cfg.defrost()
    ref_cfg.merge_from_file(os.path.join(REFERENCE_ROOT, config_file))
    ref_cfg.MODEL.WEIGHT = ""
    ref_cfg.MODEL.DEVICE = "cpu"
    from paa_core.modeling.detector import build_detection_model

    model = build_detection_model(ref_cfg)
    model.eval()
    return model, ref_cfg


def randomize_state_dict(model, seed: int = 0):
    """Overwrite every parameter/buffer with random values so that any
    key-mapping or transpose mistake in the importer shows up as a numeric
    mismatch (default-initialized FrozenBN buffers are 0/1 and would mask
    running_mean/var mapping bugs)."""
    import torch

    rng = np.random.RandomState(seed)
    sd = model.state_dict()
    new = {}
    for k, v in sd.items():
        shape = tuple(v.shape)
        if "anchor_generator" in k:
            new[k] = v  # precomputed anchor buffers: keep
        elif k.endswith("running_var"):
            new[k] = torch.as_tensor(
                rng.uniform(0.5, 2.0, shape), dtype=v.dtype
            )
        elif k.endswith("running_mean"):
            new[k] = torch.as_tensor(
                rng.normal(0.0, 0.1, shape), dtype=v.dtype
            )
        else:
            new[k] = torch.as_tensor(
                rng.normal(0.0, 0.05, shape), dtype=v.dtype
            )
    model.load_state_dict(new)
    return {k: np.asarray(v.detach().numpy()) for k, v in new.items()}


def torch_key_to_c2_name(key: str):
    """Reference torch backbone-body key -> Detectron blob name
    (the inverse of paa_core/utils/c2_model_loading.py's renaming)."""
    import re

    key = key.replace("backbone.body.", "")
    if key == "stem.conv1.weight":
        return "conv1_w"
    if key == "stem.bn1.weight":
        return "res_conv1_bn_s"
    if key == "stem.bn1.bias":
        return "res_conv1_bn_b"
    branch2 = {"1": "branch2a", "2": "branch2b", "3": "branch2c"}
    m = re.match(r"^layer(\d)\.(\d+)\.conv(\d)\.weight$", key)
    if m:
        l, b, i = m.groups()
        return f"res{int(l) + 1}_{b}_{branch2[i]}_w"
    m = re.match(r"^layer(\d)\.(\d+)\.bn(\d)\.(weight|bias)$", key)
    if m:
        l, b, i, leaf = m.groups()
        sb = "s" if leaf == "weight" else "b"
        return f"res{int(l) + 1}_{b}_{branch2[i]}_bn_{sb}"
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.0\.weight$", key)
    if m:
        l, b = m.groups()
        return f"res{int(l) + 1}_{b}_branch1_w"
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.1\.(weight|bias)$", key)
    if m:
        l, b, leaf = m.groups()
        sb = "s" if leaf == "weight" else "b"
        return f"res{int(l) + 1}_{b}_branch1_bn_{sb}"
    return None  # running stats: pre-folded in c2 pickles, no blob


def permute_and_flatten(t, num_anchors: int, channels: int):
    """Reference rpn/utils.py:10-24 flattening of a per-level NCHW head
    output to (N, H*W*A, C), as numpy."""
    t = np.asarray(t.detach().numpy())
    n, _, h, w = t.shape
    t = t.reshape(n, num_anchors, channels, h, w)
    t = np.transpose(t, (0, 3, 4, 1, 2))
    return t.reshape(n, -1, channels)
