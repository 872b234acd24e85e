"""Weight import: torch / Caffe2 checkpoints -> flax params.

Re-implements the reference's weight-ingestion path
(paa_core/utils/c2_model_loading.py key translation +
model_serialization.py suffix matching + DetectronCheckpointer
catalog:// resolution) for the flax parameter tree:

- ``load_torch_state_dict``: a torch ``.pth`` of the reference PAA model
  (e.g. the released PAA_R_50_FPN_1x weights) -> our params. Conv weights
  (O, I, kh, kw) transpose to NHWC kernels (kh, kw, I, O); GroupNorm
  weight/bias map to gn/scale, gn/bias; FrozenBN buffers map 1:1.
- ``load_c2_pickle``: a Detectron ImageNet backbone ``.pkl``
  (res2_0_branch2a_w naming; BN pre-folded into s/b with identity
  stats) -> backbone params.
"""

from __future__ import annotations

import pickle
import re

import numpy as np


def _conv_to_nhwc(w):
    w = np.asarray(w)
    return np.transpose(w, (2, 3, 1, 0))


def stem_kernel_to_s2d(k_hwio):
    """(7, 7, C, O) stem kernel -> the exact (4, 4, 4C, O) kernel for
    the 2x2-space-to-depth stem (modeling/resnet.py Stem): pad to 8x8
    with a leading zero row/col, then
    K2[a, b, (dy*2 + dx)*C + c] = W8[2a + dy, 2b + dx, c]."""
    kh, kw, c, o = k_hwio.shape
    assert (kh, kw) == (7, 7), k_hwio.shape
    w8 = np.zeros((8, 8, c, o), k_hwio.dtype)
    w8[1:, 1:] = k_hwio
    k2 = np.zeros((4, 4, 4 * c, o), k_hwio.dtype)
    for dy in range(2):
        for dx in range(2):
            sl = slice((dy * 2 + dx) * c, (dy * 2 + dx) * c + c)
            k2[:, :, sl] = w8[dy::2, dx::2]
    return k2


def torch_name_to_flax_path(name):
    """Map a reference torch state-dict key to a flax param path
    (tuple of keys) + a transform tag ('conv'|'copy'|'scalar')."""
    # backbone body
    m = re.match(r"^(?:module\.)?backbone\.body\.stem\.conv1\.weight$", name)
    if m:
        return ("backbone", "resnet", "stem", "conv1", "kernel"), "conv"
    m = re.match(
        r"^(?:module\.)?backbone\.body\.stem\.bn1\.(\w+)$", name
    )
    if m:
        return ("backbone", "resnet", "stem", "bn1", m.group(1)), "copy"
    m = re.match(
        r"^(?:module\.)?backbone\.body\.layer(\d)\.(\d+)\.conv(\d)\.weight$",
        name,
    )
    if m:
        l, b, i = m.groups()
        return (
            ("backbone", "resnet", f"layer{l}_{b}", f"conv{i}", "kernel"),
            "conv",
        )
    m = re.match(
        r"^(?:module\.)?backbone\.body\.layer(\d)\.(\d+)\.bn(\d)\.(\w+)$",
        name,
    )
    if m:
        l, b, i, leaf = m.groups()
        return (
            ("backbone", "resnet", f"layer{l}_{b}", f"bn{i}", leaf),
            "copy",
        )
    m = re.match(
        r"^(?:module\.)?backbone\.body\.layer(\d)\.(\d+)\.downsample\.0\.weight$",
        name,
    )
    if m:
        l, b = m.groups()
        return (
            (
                "backbone", "resnet", f"layer{l}_{b}", "downsample_conv",
                "kernel",
            ),
            "conv",
        )
    m = re.match(
        r"^(?:module\.)?backbone\.body\.layer(\d)\.(\d+)\.downsample\.1\.(\w+)$",
        name,
    )
    if m:
        l, b, leaf = m.groups()
        return (
            ("backbone", "resnet", f"layer{l}_{b}", "downsample_bn", leaf),
            "copy",
        )
    # fpn
    m = re.match(
        r"^(?:module\.)?backbone\.fpn\.(fpn_inner\d|fpn_layer\d)\.(weight|bias)$",
        name,
    )
    if m:
        mod, leaf = m.groups()
        leaf = "kernel" if leaf == "weight" else "bias"
        return (
            ("backbone", "fpn", mod, leaf),
            "conv" if leaf == "kernel" else "copy",
        )
    # GN FPN variant: conv_with_kaiming_uniform(use_gn) wraps each block
    # in nn.Sequential(conv, gn) -> fpn_inner2.0.weight / .1.{weight,bias}
    m = re.match(
        r"^(?:module\.)?backbone\.fpn\.(fpn_inner\d|fpn_layer\d)\.(\d)"
        r"\.(weight|bias)$",
        name,
    )
    if m:
        mod, idx, leaf = m.groups()
        if idx == "0":  # conv
            leaf = "kernel" if leaf == "weight" else "bias"
            return (
                ("backbone", "fpn", mod, leaf),
                "conv" if leaf == "kernel" else "copy",
            )
        leaf = "scale" if leaf == "weight" else "bias"
        return ("backbone", "fpn", f"{mod}_gn", "gn", leaf), "copy"
    m = re.match(
        r"^(?:module\.)?backbone\.fpn\.top_blocks\.(p6|p7)\.(weight|bias)$",
        name,
    )
    if m:
        mod, leaf = m.groups()
        leaf = "kernel" if leaf == "weight" else "bias"
        return (
            ("backbone", "fpn", mod, leaf),
            "conv" if leaf == "kernel" else "copy",
        )
    # PAA head
    m = re.match(
        r"^(?:module\.)?rpn\.head\.(cls_tower|bbox_tower)\.(\d+)\.(weight|bias)$",
        name,
    )
    if m:
        tower, idx, leaf = m.groups()
        idx = int(idx)
        conv_idx, within = divmod(idx, 3)
        if within == 0:  # conv
            leaf = "kernel" if leaf == "weight" else "bias"
            return (
                ("head", tower, f"conv{conv_idx}", leaf),
                "conv" if leaf == "kernel" else "copy",
            )
        elif within == 1:  # GroupNorm
            leaf = "scale" if leaf == "weight" else "bias"
            return ("head", tower, f"gn{conv_idx}", "gn", leaf), "copy"
        return None
    m = re.match(
        r"^(?:module\.)?rpn\.head\.(cls_logits|bbox_pred|iou_pred|centerness)"
        r"\.(weight|bias)$",
        name,
    )
    if m:
        mod, leaf = m.groups()
        leaf = "kernel" if leaf == "weight" else "bias"
        return (
            ("head", mod, leaf),
            "conv" if leaf == "kernel" else "copy",
        )
    m = re.match(r"^(?:module\.)?rpn\.head\.scales\.(\d+)\.scale$", name)
    if m:
        return ("head", f"scale{m.group(1)}", "scale"), "scalar"
    return None


def _set_path(tree, path, value):
    node = tree
    for k in path[:-1]:
        if k not in node:
            return False
        node = node[k]
    if path[-1] not in node:
        return False
    expect = node[path[-1]]
    if tuple(np.shape(expect)) != tuple(np.shape(value)):
        # space-to-depth stem: transform the 7x7xCx O kernel to the
        # equivalent 4x4x4C kernel the s2d Stem expects
        if (
            np.shape(value)[:2] == (7, 7)
            and tuple(np.shape(expect))
            == (4, 4, 4 * np.shape(value)[2], np.shape(value)[3])
        ):
            value = stem_kernel_to_s2d(value)
        else:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"{np.shape(expect)} vs {np.shape(value)}"
            )
    node[path[-1]] = value.astype(np.float32)
    return True


def load_torch_state_dict(params, state_dict, logger=None):
    """Merge a reference-model torch state dict into flax ``params``
    (returned as a new mutable dict tree)."""
    import copy

    tree = copy.deepcopy(jax_to_numpy(params))
    matched, skipped = 0, []
    for name, value in state_dict.items():
        value = np.asarray(value)
        mapping = torch_name_to_flax_path(name)
        if mapping is None:
            skipped.append(name)
            continue
        path, kind = mapping
        if kind == "conv":
            value = _conv_to_nhwc(value)
        elif kind == "scalar":
            value = np.asarray(value).reshape(())
        if _set_path(tree, path, value):
            matched += 1
        elif (
            kind == "copy"
            and path[-1] in ("weight", "bias")
            and _set_path(
                tree,
                path[:-1]
                + ("gn", "scale" if path[-1] == "weight" else "bias"),
                value,
            )
        ):
            # GN backbone variants (BottleneckWithGN/StemWithGN): the
            # torch module is a GroupNorm under the bn* name; our flax
            # GroupNorm32 stores scale/bias under a "gn" child
            matched += 1
        else:
            skipped.append(name)
    if logger:
        logger.info(
            f"torch import: matched {matched} tensors, "
            f"skipped {len(skipped)}"
        )
        for s in skipped[:20]:
            logger.info(f"  skipped: {s}")
    return tree


_C2_STAGE = {"res2": 1, "res3": 2, "res4": 3, "res5": 4}
_C2_BRANCH = {"branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3"}


def c2_name_to_flax_path(name):
    """Detectron ImageNet backbone key -> flax path under resnet."""
    if name == "conv1_w":
        return ("stem", "conv1", "kernel"), "conv"
    if name in ("res_conv1_bn_s", "conv1_bn_s"):
        return ("stem", "bn1", "weight"), "copy"
    if name in ("res_conv1_bn_b", "conv1_bn_b"):
        return ("stem", "bn1", "bias"), "copy"
    m = re.match(r"^(res\d)_(\d+)_(branch2[abc])_w$", name)
    if m:
        stage, block, branch = m.groups()
        return (
            (
                f"layer{_C2_STAGE[stage]}_{block}",
                _C2_BRANCH[branch],
                "kernel",
            ),
            "conv",
        )
    m = re.match(r"^(res\d)_(\d+)_(branch2[abc])_bn_([sb])$", name)
    if m:
        stage, block, branch, leaf = m.groups()
        leaf = "weight" if leaf == "s" else "bias"
        return (
            (
                f"layer{_C2_STAGE[stage]}_{block}",
                _C2_BRANCH[branch].replace("conv", "bn"),
                leaf,
            ),
            "copy",
        )
    m = re.match(r"^(res\d)_(\d+)_branch1_w$", name)
    if m:
        stage, block = m.groups()
        return (
            (f"layer{_C2_STAGE[stage]}_{block}", "downsample_conv",
             "kernel"),
            "conv",
        )
    m = re.match(r"^(res\d)_(\d+)_branch1_bn_([sb])$", name)
    if m:
        stage, block, leaf = m.groups()
        leaf = "weight" if leaf == "s" else "bias"
        return (
            (f"layer{_C2_STAGE[stage]}_{block}", "downsample_bn", leaf),
            "copy",
        )
    return None


def load_c2_pickle(params, pkl_path, logger=None):
    """Load a Detectron ImageNet backbone pickle into the resnet subtree.

    BN statistics are pre-folded in these pickles (only s/b present), so
    running_mean/var keep their 0/1 init — identical to the reference's
    FrozenBatchNorm2d usage after c2 loading.
    """
    import copy

    with open(pkl_path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if "blobs" in data:
        data = data["blobs"]

    tree = copy.deepcopy(jax_to_numpy(params))
    resnet = tree["backbone"]["resnet"]
    matched, skipped = 0, []
    for name, value in data.items():
        mapping = c2_name_to_flax_path(name)
        if mapping is None:
            skipped.append(name)
            continue
        path, kind = mapping
        value = np.asarray(value)
        if kind == "conv":
            value = _conv_to_nhwc(value)
        if _set_path(resnet, path, value):
            matched += 1
        else:
            skipped.append(name)
    if logger:
        logger.info(
            f"c2 import: matched {matched} tensors, skipped "
            f"{len(skipped)} (momentum/fc blobs expected here)"
        )
    return tree


def jax_to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def load_pretrained_into(cfg, params, weight, logger=None):
    """DetectronCheckpointer-style dispatch on the WEIGHT string."""
    if weight.startswith("catalog://"):
        from ..config.paths_catalog import ModelCatalog

        weight = ModelCatalog.get(weight[len("catalog://"):])
    if weight.startswith(("http://", "https://")):
        from .misc import cache_url

        weight = cache_url(weight)
    if weight.endswith(".pkl"):
        return load_c2_pickle(params, weight, logger)
    # torch checkpoint
    import torch

    ckpt = torch.load(weight, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("model", ckpt)
    state_dict = {
        k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in state_dict.items()
    }
    return load_torch_state_dict(params, state_dict, logger)
