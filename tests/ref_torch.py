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

_REF_CFG_DEFAULTS = None  # pristine reference-cfg snapshot (see below)


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

        def _roi_align_forward(inp, rois, spatial_scale, pooled_h,
                               pooled_w, sampling_ratio):
            """CPU ROIAlign via our JAX kernel (legacy aligned=False
            semantics, matching csrc/cpu/ROIAlign_cpu.cpp): input NCHW,
            rois (R, 5) [batch_idx, x1, y1, x2, y2] -> NCHW output.
            Lets the reference Pooler/feature extractors run on CPU."""
            import jax.numpy as jnp
            import torch

            from paa_tpu.ops.roi_align import roi_align as jax_roi_align

            x = jnp.asarray(
                inp.detach().numpy().transpose(0, 2, 3, 1)
            )
            r = rois.detach().numpy()
            out = jax_roi_align(
                x,
                jnp.asarray(r[:, 1:5]),
                jnp.asarray(r[:, 0].astype(np.int32)),
                (int(pooled_h), int(pooled_w)),
                float(spatial_scale),
                int(sampling_ratio),
            )
            return torch.as_tensor(
                np.asarray(out).transpose(0, 3, 1, 2)
            ).to(inp.dtype)

        def _roi_align_backward(grad, rois, spatial_scale, pooled_h,
                                pooled_w, bs, ch, h, w, sampling_ratio):
            """Gradient of ROIAlign w.r.t. the input feature map via
            jax.vjp of our kernel (layers/roi_align.py:26-44 calls this
            for the backbone gradients of the two-stage train path)."""
            import jax
            import jax.numpy as jnp
            import torch

            from paa_tpu.ops.roi_align import roi_align as jax_roi_align

            r = rois.detach().numpy()
            boxes = jnp.asarray(r[:, 1:5])
            bidx = jnp.asarray(r[:, 0].astype(np.int32))

            def f(x_nhwc):
                return jax_roi_align(
                    x_nhwc, boxes, bidx,
                    (int(pooled_h), int(pooled_w)),
                    float(spatial_scale), int(sampling_ratio),
                )

            zero = jnp.zeros((int(bs), int(h), int(w), int(ch)),
                             jnp.float32)
            _, vjp = jax.vjp(f, zero)
            g = jnp.asarray(
                grad.detach().numpy().transpose(0, 2, 3, 1)
            )
            (gx,) = vjp(g)
            return torch.as_tensor(
                np.asarray(gx).transpose(0, 3, 1, 2)
            ).to(grad.dtype)

        class _CStub(types.ModuleType):
            """Raises on CUDA-only ops; provides real python nms/ml_nms
            (and a JAX-backed roi_align forward/backward) so the
            reference post-processing and ROI heads run on CPU,
            including the two-stage train path's backbone gradients."""

            nms = staticmethod(_py_nms)
            ml_nms = staticmethod(_py_ml_nms)
            roi_align_forward = staticmethod(_roi_align_forward)
            roi_align_backward = staticmethod(_roi_align_backward)

            def __getattr__(self, name):
                if name.startswith("__"):
                    raise AttributeError(name)

                def _fail(*a, **k):
                    raise RuntimeError(f"paa_core._C.{name} stub called")

                return _fail

        sys.modules["paa_core._C"] = _CStub("paa_core._C")
    _patch_dcn_cpu()


def _patch_dcn_cpu() -> None:
    """Make the reference's (Modulated)DeformConv run on CPU by routing
    the forward through our JAX kernel (the reference autograd wrappers
    raise NotImplementedError off-GPU, layers/dcn/deform_conv_func.py:42).

    The offset/mask channel conventions are identical on both sides
    (per deformable group, per kernel position, a (dy, dx) pair — CUDA
    layout), so only NCHW<->NHWC transposes are needed. NOTE the
    circularity boundary: this makes import/forward parity tests
    sensitive to weight-layout mapping errors (both sides consume the
    same torch weights through their own layout paths), but it does NOT
    re-verify kernel semantics — those are pinned separately against a
    numpy transcription of the CUDA kernel in tests/test_dcn.py."""
    import torch

    from paa_core.layers.dcn import deform_conv_module as _m

    from paa_tpu.ops.dcn import deform_conv2d as _jax_dcn

    def _run(mod, inp, offset, mask):
        import jax.numpy as jnp

        def _pair0(v):
            return v[0] if isinstance(v, (tuple, list)) else v

        x = jnp.asarray(inp.detach().numpy().transpose(0, 2, 3, 1))
        off = jnp.asarray(
            offset.detach().numpy().transpose(0, 2, 3, 1)
        )
        mk = (
            None if mask is None
            else jnp.asarray(mask.detach().numpy().transpose(0, 2, 3, 1))
        )
        w = jnp.asarray(
            mod.weight.detach().numpy().transpose(2, 3, 1, 0)
        )
        out = _jax_dcn(
            x, off, mk, w,
            strides=_pair0(mod.stride),
            padding=_pair0(mod.padding),
            dilation=_pair0(mod.dilation),
            groups=mod.groups,
            deformable_groups=mod.deformable_groups,
        )
        y = torch.as_tensor(
            np.asarray(out).transpose(0, 3, 1, 2)
        ).to(inp.dtype)
        if getattr(mod, "bias", None) is not None:
            y = y + mod.bias.reshape(1, -1, 1, 1)
        return y

    _m.DeformConv.forward = (
        lambda self, input, offset: _run(self, input, offset, None)
    )
    _m.ModulatedDeformConv.forward = (
        lambda self, input, offset, mask: _run(self, input, offset, mask)
    )


def build_reference_model(
    config_file: str = "configs/paa/paa_R_50_FPN_1x.yaml",
    opts=None,
):
    """Build the reference torch detection model on CPU (eval mode).

    ``opts``: optional flat [key, value, ...] override list merged after
    the file (same shape as the reference CLI's trailing opts)."""
    install_shims()
    from paa_core.config import cfg as ref_cfg

    if ref_cfg.is_frozen():
        ref_cfg.defrost()
    # the reference cfg is a singleton: restore pristine defaults before
    # merging so overrides from a previous build in the same process
    # (e.g. DCN stages) don't leak into this one
    global _REF_CFG_DEFAULTS
    if _REF_CFG_DEFAULTS is None:
        _REF_CFG_DEFAULTS = ref_cfg.clone()
    else:
        ref_cfg.merge_from_other_cfg(_REF_CFG_DEFAULTS)
    ref_cfg.merge_from_file(os.path.join(REFERENCE_ROOT, config_file))
    if opts:
        ref_cfg.merge_from_list(list(opts))
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


_C2_LAST_BLOCK = {"R-50": {2: 2, 3: 3, 4: 5, 5: 2}}


def torch_key_to_c2_detection_name(key: str, arch: str = "R-50"):
    """Reference torch detection-model key -> Detectron blob name
    (inverse of the FULL c2_model_loading.py rename surface: FPN
    laterals/outputs, RPN head, box/mask/keypoint ROI heads), for
    synthesizing Caffe2Detectron/COCO-shaped pickles in tests."""
    import re

    last = _C2_LAST_BLOCK[arch]
    wb = {"weight": "w", "bias": "b"}
    m = re.match(r"^backbone\.fpn\.fpn_inner(\d)\.(weight|bias)$", key)
    if m:
        lvl, leaf = int(m.group(1)), wb[m.group(2)]
        stage = lvl + 1
        lateral = "" if stage == 5 else "_lateral"
        return (
            f"fpn_inner_res{stage}_{last[stage]}_sum{lateral}_{leaf}"
        )
    m = re.match(r"^backbone\.fpn\.fpn_layer(\d)\.(weight|bias)$", key)
    if m:
        lvl, leaf = int(m.group(1)), wb[m.group(2)]
        stage = lvl + 1
        return f"fpn_res{stage}_{last[stage]}_sum_{leaf}"
    m = re.match(r"^rpn\.head\.conv\.(weight|bias)$", key)
    if m:
        return f"conv_rpn_fpn2_{wb[m.group(1)]}"
    m = re.match(r"^rpn\.head\.(cls_logits|bbox_pred)\.(weight|bias)$",
                 key)
    if m:
        return f"rpn_{m.group(1)}_fpn2_{wb[m.group(2)]}"
    m = re.match(
        r"^roi_heads\.box\.feature_extractor\.fc(6|7)\.(weight|bias)$",
        key,
    )
    if m:
        return f"fc{m.group(1)}_{wb[m.group(2)]}"
    m = re.match(
        r"^roi_heads\.box\.predictor\.(cls_score|bbox_pred)"
        r"\.(weight|bias)$",
        key,
    )
    if m:
        return f"{m.group(1)}_{wb[m.group(2)]}"
    m = re.match(
        r"^roi_heads\.mask\.feature_extractor\.mask_fcn(\d)"
        r"\.(weight|bias)$",
        key,
    )
    if m:
        return f"_[mask]_fcn{m.group(1)}_{wb[m.group(2)]}"
    m = re.match(
        r"^roi_heads\.mask\.predictor\.(mask_fcn_logits|conv5_mask)"
        r"\.(weight|bias)$",
        key,
    )
    if m:
        return f"{m.group(1)}_{wb[m.group(2)]}"
    m = re.match(
        r"^roi_heads\.keypoint\.feature_extractor\.conv_fcn(\d+)"
        r"\.(weight|bias)$",
        key,
    )
    if m:
        return f"conv_fcn{m.group(1)}_{wb[m.group(2)]}"
    m = re.match(
        r"^roi_heads\.keypoint\.predictor\.(kps_score_lowres|kps_score)"
        r"\.(weight|bias)$",
        key,
    )
    if m:
        return f"{m.group(1)}_{wb[m.group(2)]}"
    return torch_key_to_c2_name(key)


def permute_and_flatten(t, num_anchors: int, channels: int):
    """Reference rpn/utils.py:10-24 flattening of a per-level NCHW head
    output to (N, H*W*A, C), as numpy."""
    t = np.asarray(t.detach().numpy())
    n, _, h, w = t.shape
    t = t.reshape(n, num_anchors, channels, h, w)
    t = np.transpose(t, (0, 3, 4, 1, 2))
    return t.reshape(n, -1, channels)
