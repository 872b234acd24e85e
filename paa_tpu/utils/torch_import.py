"""Weight import: torch / Caffe2 checkpoints -> flax params.

Re-implements the reference's weight-ingestion path
(paa_core/utils/c2_model_loading.py key translation +
model_serialization.py suffix matching + DetectronCheckpointer
catalog:// resolution) for the flax parameter tree:

- ``load_torch_state_dict``: a torch ``.pth`` of the reference PAA model
  (e.g. the released PAA_R_50_FPN_1x weights) -> our params. Conv weights
  (O, I, kh, kw) transpose to NHWC kernels (kh, kw, I, O); GroupNorm
  weight/bias map to gn/scale, gn/bias; FrozenBN buffers map 1:1.
- ``load_c2_pickle``: a Detectron ``.pkl`` — an ImageNet backbone
  (res2_0_branch2a_w naming; BN pre-folded into s/b with identity
  stats) or a full Caffe2Detectron/COCO detection model (FPN laterals,
  RPN head, box/mask/keypoint ROI heads) -> params.
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
    # DCN bottlenecks: the reference DFConv2d (layers/misc.py:113-185)
    # stores the deformable conv under ``.conv`` and the offset conv
    # under ``.offset``; our DeformConv (ops/dcn.py) keeps the sampled
    # conv's kernel directly on conv2 with an ``offset`` child conv
    m = re.match(
        r"^(?:module\.)?backbone\.body\.layer(\d)\.(\d+)\.conv2\.conv"
        r"\.(weight|bias)$",
        name,
    )
    if m:
        l, b, leaf = m.groups()
        leaf = "kernel" if leaf == "weight" else "bias"
        return (
            ("backbone", "resnet", f"layer{l}_{b}", "conv2", leaf),
            "conv" if leaf == "kernel" else "copy",
        )
    m = re.match(
        r"^(?:module\.)?backbone\.body\.layer(\d)\.(\d+)\.conv2\.offset"
        r"\.(weight|bias)$",
        name,
    )
    if m:
        l, b, leaf = m.groups()
        leaf = "kernel" if leaf == "weight" else "bias"
        return (
            ("backbone", "resnet", f"layer{l}_{b}", "conv2", "offset",
             leaf),
            "conv" if leaf == "kernel" else "copy",
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
    # DCN last tower conv (USE_DCN_IN_TOWER, rpn/paa/paa.py:27-29):
    # DFConv2d under the tower Sequential slot -> .conv / .offset keys
    m = re.match(
        r"^(?:module\.)?rpn\.head\.(cls_tower|bbox_tower)\.(\d+)"
        r"\.(conv|offset)\.(weight|bias)$",
        name,
    )
    if m:
        tower, idx, sub, leaf = m.groups()
        conv_idx = int(idx) // 3
        leaf = "kernel" if leaf == "weight" else "bias"
        if sub == "conv":
            return (
                ("head", tower, f"conv{conv_idx}", leaf),
                "conv" if leaf == "kernel" else "copy",
            )
        return (
            ("head", tower, f"conv{conv_idx}", "offset", leaf),
            "conv" if leaf == "kernel" else "copy",
        )
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


_BOTTLENECK_LEAVES = (
    # (torch sub-key regex, flax child template, kind-for-weight)
    (re.compile(r"^conv(\d)\.weight$"), "conv{0}", "conv"),
    (re.compile(r"^bn(\d)\.(\w+)$"), "bn{0}", "copy"),
    (re.compile(r"^downsample\.0\.weight$"), "downsample_conv", "conv"),
    (re.compile(r"^downsample\.1\.(\w+)$"), "downsample_bn", "copy"),
)


def _bottleneck_path(prefix, block_name, rest):
    """Map a reference Bottleneck sub-key (conv1.weight, bn2.bias,
    downsample.0.weight, ...) under ``prefix + (block_name,)``."""
    m = re.match(r"^conv(\d)\.weight$", rest)
    if m:
        return (prefix + (block_name, f"conv{m.group(1)}", "kernel"),
                "conv")
    m = re.match(r"^bn(\d)\.(\w+)$", rest)
    if m:
        return (prefix + (block_name, f"bn{m.group(1)}", m.group(2)),
                "copy")
    if rest == "downsample.0.weight":
        return (prefix + (block_name, "downsample_conv", "kernel"),
                "conv")
    m = re.match(r"^downsample\.1\.(\w+)$", rest)
    if m:
        return (prefix + (block_name, "downsample_bn", m.group(1)),
                "copy")
    return None


def two_stage_name_candidates(name, xconv_gn=False):
    """Candidate flax paths for the reference two-stage model's
    RPN/ROI-head keys (maskrcnn-benchmark naming, inherited by the
    reference: rpn/rpn.py:90-94, roi_box_feature_extractors.py:70-71,
    roi_box_predictors.py:41-43, roi_mask_feature_extractors.py:49-54,
    roi_mask_predictors.py:18-19, roi_keypoint_*:30/14). Returns a list
    of (path, kind) tried in order by ``load_torch_state_dict``.

    ``xconv_gn``: the FPNXconv1fc extractor's ``xconvs`` Sequential has
    [conv, GN, ReLU] per block with GN and [conv, ReLU] without
    (make_layers.py make_conv3x3) — the flat indices are ambiguous
    between the two layouts, so the caller pre-scans the state dict.
    """
    out = []
    # classic RPN head (rpn.py:90-94): shared 3x3 conv + 1x1 heads
    m = re.match(
        r"^(?:module\.)?rpn\.head\.(conv|cls_logits|bbox_pred)"
        r"\.(weight|bias)$",
        name,
    )
    if m:
        mod, leaf = m.groups()
        leaf = "kernel" if leaf == "weight" else "bias"
        out.append((
            ("rpn_head", mod, leaf),
            "conv" if leaf == "kernel" else "copy",
        ))
    m = re.match(
        r"^(?:module\.)?roi_heads\.(box|mask|keypoint)"
        r"\.(feature_extractor|predictor)\.(.+)$",
        name,
    )
    if not m:
        return out
    branch, part, rest = m.groups()
    head = {
        "box": "box_head", "mask": "mask_head",
        "keypoint": "keypoint_head",
    }[branch]

    def conv_leaf(leaf):
        return ("kernel" if leaf == "weight" else "bias",
                "conv" if leaf == "weight" else "copy")

    if part == "feature_extractor":
        # FPN2MLP fc6/fc7 — plain Linear, or Sequential(fc, GN) with GN
        # (make_fc). fc6's input is the NCHW-flattened pooled feature:
        # its weight columns are permuted to our NHWC flatten order
        # ("fc_nchw"); fc7 is a plain (out, in) transpose ("dense").
        m2 = re.match(r"^fc(6|7)(?:\.0)?\.weight$", rest)
        if m2:
            kind = "fc_nchw" if m2.group(1) == "6" else "dense"
            out.append(((head, f"fc{m2.group(1)}", "kernel"), kind))
        m2 = re.match(r"^fc(6|7)\.bias$", rest)
        if m2:
            out.append(((head, f"fc{m2.group(1)}", "bias"), "copy"))
        m2 = re.match(r"^fc(6|7)\.1\.(weight|bias)$", rest)
        if m2:
            leaf = "scale" if m2.group(2) == "weight" else "bias"
            out.append(
                ((head, f"fc{m2.group(1)}_gn", "gn", leaf), "copy"))
        # FPNXconv1fc stacked convs
        m2 = re.match(r"^xconvs\.(\d+)\.(weight|bias)$", rest)
        if m2:
            idx, leaf = int(m2.group(1)), m2.group(2)
            if xconv_gn:
                blk, within = divmod(idx, 3)
                if within == 0:
                    kleaf, kind = conv_leaf(leaf)
                    out.append(
                        ((head, f"xconv{blk + 1}", kleaf), kind))
                elif within == 1:
                    out.append((
                        (head, f"xconv{blk + 1}_gn", "gn",
                         "scale" if leaf == "weight" else "bias"),
                        "copy",
                    ))
            elif idx % 2 == 0:
                kleaf, kind = conv_leaf(leaf)
                out.append(
                    ((head, f"xconv{idx // 2 + 1}", kleaf), kind))
        # C4 res5 extractor (ResNet50Conv5ROIFeatureExtractor)
        m2 = re.match(r"^head\.layer4\.(\d+)\.(.+)$", rest)
        if m2:
            b, sub = m2.groups()
            mapped = _bottleneck_path((head,), f"layer4_{b}", sub)
            if mapped:
                out.append(mapped)
        # mask convs (make_conv3x3: plain, or Sequential(conv, GN))
        m2 = re.match(r"^mask_fcn(\d)(?:\.0)?\.(weight|bias)$", rest)
        if m2:
            kleaf, kind = conv_leaf(m2.group(2))
            out.append(((head, f"mask_fcn{m2.group(1)}", kleaf), kind))
        m2 = re.match(r"^mask_fcn(\d)\.1\.(weight|bias)$", rest)
        if m2:
            leaf = "scale" if m2.group(2) == "weight" else "bias"
            out.append(
                ((head, f"mask_fcn{m2.group(1)}_gn", "gn", leaf),
                 "copy"))
        # keypoint convs (plain Conv2d)
        m2 = re.match(r"^conv_fcn(\d+)\.(weight|bias)$", rest)
        if m2:
            kleaf, kind = conv_leaf(m2.group(2))
            out.append(((head, f"conv_fcn{m2.group(1)}", kleaf), kind))
    else:  # predictor
        m2 = re.match(r"^(cls_score|bbox_pred)\.(weight|bias)$", rest)
        if m2:
            mod, leaf = m2.groups()
            out.append((
                (head, mod, "kernel" if leaf == "weight" else "bias"),
                "dense" if leaf == "weight" else "copy",
            ))
        m2 = re.match(r"^(conv5_mask|kps_score_lowres)\.(weight|bias)$",
                      rest)
        if m2:
            mod, leaf = m2.groups()
            out.append((
                (head, mod, "kernel" if leaf == "weight" else "bias"),
                "deconv" if leaf == "weight" else "copy",
            ))
        m2 = re.match(r"^mask_fcn_logits\.(weight|bias)$", rest)
        if m2:
            # our mask predictors emit C-1 foreground channels; the
            # reference allocates NUM_CLASSES and never uses channel 0
            # (PARITY.md) — drop it on import
            if m2.group(1) == "weight":
                out.append(((head, "mask_fcn_logits", "kernel"),
                            "conv_dropbg"))
            else:
                out.append(((head, "mask_fcn_logits", "bias"),
                            "bias_dropbg"))
    return out


def _set_path(tree, path, value, strict=True):
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
        elif not strict:
            return False
        else:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"{np.shape(expect)} vs {np.shape(value)}"
            )
    node[path[-1]] = value.astype(np.float32)
    return True


def _fc_nchw_to_nhwc(w, resolution):
    """FPN2MLP fc6 weight (out, C*R*R) with torch NCHW-flatten column
    order (c*R*R + h*R + w) -> flax Dense kernel (R*R*C, out) in our
    NHWC-flatten order (h*R*C + w*C + c)
    (roi_box_feature_extractors.py:76-78 x.view vs roi_box_head.py
    x.reshape)."""
    out_dim, in_dim = w.shape
    r = resolution
    if in_dim % (r * r):
        raise ValueError(
            f"fc6 in_dim {in_dim} not divisible by resolution^2 {r * r}"
        )
    c = in_dim // (r * r)
    return (
        w.reshape(out_dim, c, r, r)
        .transpose(2, 3, 1, 0)
        .reshape(r * r * c, out_dim)
    )


def _deconv_to_flax(w):
    """torch ConvTranspose2d weight (in, out, kh, kw) -> flax
    nn.ConvTranspose kernel (kh, kw, in, out). flax lowers to
    lax.conv_transpose(transpose_kernel=False) — a fractionally-strided
    cross-correlation — so the torch kernel (true conv-gradient
    semantics) must be spatially flipped."""
    return np.ascontiguousarray(
        np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1]
    )


def _apply_transform(value, kind, box_pooler_resolution):
    if kind == "conv":
        return _conv_to_nhwc(value)
    if kind == "scalar":
        return np.asarray(value).reshape(())
    if kind == "dense":
        return np.asarray(value).T
    if kind == "fc_nchw":
        return _fc_nchw_to_nhwc(np.asarray(value), box_pooler_resolution)
    if kind == "deconv":
        return _deconv_to_flax(value)
    if kind == "conv_dropbg":
        return _conv_to_nhwc(value)[..., 1:]
    if kind == "bias_dropbg":
        return np.asarray(value)[1:]
    return value  # "copy"


def _flax_candidates_for_torch_name(name, xconv_gn=False):
    """All (flax path, transform kind) candidates for one reference
    torch state-dict key, tried in order against the param tree."""
    candidates = []
    single = torch_name_to_flax_path(name)
    if single is not None:
        candidates.append(single)
        path, kind = single
        if kind == "copy" and path[-1] in ("weight", "bias"):
            # GN backbone variants (BottleneckWithGN/StemWithGN): the
            # torch module is a GroupNorm under the bn* name; our flax
            # GroupNorm32 stores scale/bias under "gn"
            candidates.append((
                path[:-1]
                + ("gn", "scale" if path[-1] == "weight" else "bias"),
                "copy",
            ))
    candidates.extend(two_stage_name_candidates(name, xconv_gn))
    return candidates


def load_torch_state_dict(params, state_dict, logger=None,
                          box_pooler_resolution=7):
    """Merge a reference-model torch state dict into flax ``params``
    (returned as a new mutable dict tree). Covers the dense heads
    (PAA/ATSS/FCOS/RetinaNet), backbone + FPN, and the two-stage
    RPN/ROI-head modules (box/mask/keypoint).

    ``box_pooler_resolution``: the box head's pooled size (cfg
    MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION), needed to unpermute fc6's
    NCHW-flattened input columns."""
    import copy

    tree = copy.deepcopy(jax_to_numpy(params))
    # the FPNXconv1fc 'xconvs' Sequential layout is ambiguous from a
    # single key: with GN its index 1 is the GN (so 'xconvs.1.weight'
    # exists); without, index 1 is a parameter-less ReLU
    xconv_gn = any(
        re.search(r"\.xconvs\.1\.weight$", k) for k in state_dict
    )
    matched, skipped = 0, []
    for name, value in state_dict.items():
        value = np.asarray(value)
        candidates = _flax_candidates_for_torch_name(name, xconv_gn)
        ok = False
        for path, kind in candidates:
            v = _apply_transform(value, kind, box_pooler_resolution)
            if _set_path(tree, path, v, strict=False):
                matched += 1
                ok = True
                break
        if not ok:
            skipped.append(name)
    if logger:
        logger.info(
            f"torch import: matched {matched} tensors, "
            f"skipped {len(skipped)}"
        )
        for s in skipped[:20]:
            logger.info(f"  skipped: {s}")
    return tree


_C2_SKIP = re.compile(r"(_momentum|weight_order|^fc1000_|^pred_[wb]$)")


def c2_blob_to_torch_names(name):
    """Detectron C2 blob name -> candidate reference torch state-dict
    names (full module paths, most likely first).

    Fresh implementation of the naming conventions the reference
    resolves in two steps — c2_model_loading.py:12-113 renames C2 blobs
    to torch-style suffixes, then model_serialization.py:10-58 suffix-
    matches them against full module paths. Here each blob maps
    directly to the full name(s) it may inhabit. Covers the detection
    surface (FPN laterals/outputs, RPN, box/mask/keypoint ROI heads) so
    Caffe2Detectron/COCO checkpoints import end to end, not just
    ImageNet backbones. Optimizer momentum / weight_order / final-fc
    blobs map to nothing (c2_model_loading.py:119-123).
    """
    if _C2_SKIP.search(name):
        return []
    # stem (GN variants store the affine under conv1_gn)
    if name == "conv1_w":
        return ["backbone.body.stem.conv1.weight"]
    m = re.match(r"^(?:res_)?conv1_(?:bn|gn)_([sb])$", name)
    if m:
        leaf = "weight" if m.group(1) == "s" else "bias"
        return [f"backbone.body.stem.bn1.{leaf}"]
    # bottleneck branches; res5 may live in the body (FPN models) or in
    # the C4 box head (ResNet50Conv5ROIFeatureExtractor) — offer both
    branch2 = {"a": 1, "b": 2, "c": 3}

    def _body(sub, stage):
        out = [f"backbone.body.layer{stage - 1}.{sub}"]
        if stage == 5:
            out.append(
                f"roi_heads.box.feature_extractor.head.layer4.{sub}"
            )
        return out

    m = re.match(r"^res(\d)_(\d+)_branch2([abc])_w$", name)
    if m:
        s, b, br = m.groups()
        return _body(f"{b}.conv{branch2[br]}.weight", int(s))
    m = re.match(r"^res(\d)_(\d+)_branch2([abc])_(?:bn|gn)_([sb])$", name)
    if m:
        s, b, br, leaf = m.groups()
        leaf = "weight" if leaf == "s" else "bias"
        return _body(f"{b}.bn{branch2[br]}.{leaf}", int(s))
    m = re.match(r"^res(\d)_(\d+)_branch1_w$", name)
    if m:
        s, b = m.groups()
        return _body(f"{b}.downsample.0.weight", int(s))
    m = re.match(r"^res(\d)_(\d+)_branch1_(?:bn|gn)_([sb])$", name)
    if m:
        s, b, leaf = m.groups()
        leaf = "weight" if leaf == "s" else "bias"
        return _body(f"{b}.downsample.1.{leaf}", int(s))
    # FPN: fpn_inner_res{S}_{B}_sum(_lateral)_{w,b} / fpn_res{S}_{B}_sum
    # — the block index is the stage's last block; only the stage
    # number determines the level (c2_model_loading.py:66-75)
    m = re.match(r"^fpn_inner_res(\d)_\d+_sum(?:_lateral)?_([wb])$", name)
    if m:
        s, leaf = m.groups()
        leaf = "weight" if leaf == "w" else "bias"
        return [f"backbone.fpn.fpn_inner{int(s) - 1}.{leaf}"]
    m = re.match(r"^fpn_res(\d)_\d+_sum_([wb])$", name)
    if m:
        s, leaf = m.groups()
        leaf = "weight" if leaf == "w" else "bias"
        return [f"backbone.fpn.fpn_layer{int(s) - 1}.{leaf}"]
    # RPN (FPN checkpoints suffix the level the shared head was traced
    # at, e.g. conv_rpn_fpn2; single-level ones don't)
    m = re.match(r"^conv_rpn(?:_fpn\d)?_([wb])$", name)
    if m:
        leaf = "weight" if m.group(1) == "w" else "bias"
        return [f"rpn.head.conv.{leaf}"]
    m = re.match(r"^rpn_(cls_logits|bbox_pred)(?:_fpn\d)?_([wb])$", name)
    if m:
        mod, leaf = m.groups()
        leaf = "weight" if leaf == "w" else "bias"
        return [f"rpn.head.{mod}.{leaf}"]
    # box head
    m = re.match(r"^fc(6|7)_([wb])$", name)
    if m:
        i, leaf = m.groups()
        leaf = "weight" if leaf == "w" else "bias"
        return [f"roi_heads.box.feature_extractor.fc{i}.{leaf}"]
    m = re.match(r"^(cls_score|bbox_pred)_([wb])$", name)
    if m:
        mod, leaf = m.groups()
        leaf = "weight" if leaf == "w" else "bias"
        return [f"roi_heads.box.predictor.{mod}.{leaf}"]
    # mask head (Detectron names the fcn stack "_[mask]_fcnN")
    m = re.match(r"^_\[mask\]_fcn(\d)_([wb])$", name)
    if m:
        i, leaf = m.groups()
        leaf = "weight" if leaf == "w" else "bias"
        return [
            f"roi_heads.mask.feature_extractor.mask_fcn{i}.{leaf}"
        ]
    m = re.match(r"^(mask_fcn_logits|conv5_mask)_([wb])$", name)
    if m:
        mod, leaf = m.groups()
        leaf = "weight" if leaf == "w" else "bias"
        return [f"roi_heads.mask.predictor.{mod}.{leaf}"]
    # keypoint head
    m = re.match(r"^conv_fcn(\d+)_([wb])$", name)
    if m:
        i, leaf = m.groups()
        leaf = "weight" if leaf == "w" else "bias"
        return [
            f"roi_heads.keypoint.feature_extractor.conv_fcn{i}.{leaf}"
        ]
    m = re.match(r"^(kps_score_lowres|kps_score)_([wb])$", name)
    if m:
        mod, leaf = m.groups()
        leaf = "weight" if leaf == "w" else "bias"
        return [f"roi_heads.keypoint.predictor.{mod}.{leaf}"]
    return []


def load_c2_pickle(params, pkl_path, logger=None,
                   box_pooler_resolution=7):
    """Load a Detectron ``.pkl`` (ImageNet backbone or a full
    Caffe2Detectron/COCO detection model) into the param tree.

    BN statistics are pre-folded in these pickles (only s/b present), so
    running_mean/var keep their 0/1 init — identical to the reference's
    FrozenBatchNorm2d usage after c2 loading. DCN models need no conv2
    remap (the reference renames conv2 -> conv2.conv for DCN stages,
    c2_model_loading.py:148-166): our DeformConv keeps the sampled
    kernel at the plain conv2 path, and its zero-init offset conv has
    no C2 blob — matching DFConv2d's zero offset init.
    """
    import copy

    with open(pkl_path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if "blobs" in data:
        data = data["blobs"]

    tree = copy.deepcopy(jax_to_numpy(params))
    matched, skipped = 0, []
    for name, value in data.items():
        value = np.asarray(value)
        ok = False
        for torch_name in c2_blob_to_torch_names(name):
            for path, kind in _flax_candidates_for_torch_name(
                torch_name
            ):
                v = _apply_transform(value, kind, box_pooler_resolution)
                if _set_path(tree, path, v, strict=False):
                    matched += 1
                    ok = True
                    break
            if ok:
                break
        if not ok:
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
        return load_c2_pickle(
            params, weight, logger,
            box_pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
        )
    # torch checkpoint
    import torch

    ckpt = torch.load(weight, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("model", ckpt)
    state_dict = {
        k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in state_dict.items()
    }
    return load_torch_state_dict(
        params, state_dict, logger,
        box_pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
    )
