"""Unit tests for the two-stage key mapping + transforms in
utils/torch_import.py (fast lane — no model builds; the numeric
end-to-end proof against the reference torch model is
tests/test_torch_import_roi.py, slow lane).

Key-name sources: reference rpn/rpn.py:90-94 (SingleConvRPNHead),
roi_box_feature_extractors.py:70-71/108-137, roi_box_predictors.py,
roi_mask_feature_extractors.py:49-54, roi_mask_predictors.py:18-19,
roi_keypoint_feature_extractors.py:30, roi_keypoint_predictors.py:14,
make_layers.py make_fc/make_conv3x3 (GN Sequential layouts).
"""

import numpy as np

from paa_tpu.utils.torch_import import (
    _deconv_to_flax,
    _fc_nchw_to_nhwc,
    two_stage_name_candidates,
)


def _only(name, **kw):
    cands = two_stage_name_candidates(name, **kw)
    assert len(cands) == 1, (name, cands)
    return cands[0]


def test_rpn_head_keys():
    assert _only("rpn.head.conv.weight") == (
        ("rpn_head", "conv", "kernel"), "conv")
    assert _only("module.rpn.head.cls_logits.bias") == (
        ("rpn_head", "cls_logits", "bias"), "copy")
    assert _only("rpn.head.bbox_pred.weight") == (
        ("rpn_head", "bbox_pred", "kernel"), "conv")


def test_box_head_fc_keys():
    assert _only("roi_heads.box.feature_extractor.fc6.weight") == (
        ("box_head", "fc6", "kernel"), "fc_nchw")
    assert _only("roi_heads.box.feature_extractor.fc7.weight") == (
        ("box_head", "fc7", "kernel"), "dense")
    assert _only("roi_heads.box.feature_extractor.fc6.bias") == (
        ("box_head", "fc6", "bias"), "copy")
    # GN variant: Sequential(fc, GroupNorm) (make_layers.py make_fc)
    assert _only("roi_heads.box.feature_extractor.fc6.0.weight") == (
        ("box_head", "fc6", "kernel"), "fc_nchw")
    assert _only("roi_heads.box.feature_extractor.fc6.1.weight") == (
        ("box_head", "fc6_gn", "gn", "scale"), "copy")
    assert _only("roi_heads.box.feature_extractor.fc6.1.bias") == (
        ("box_head", "fc6_gn", "gn", "bias"), "copy")


def test_box_predictor_keys():
    assert _only("roi_heads.box.predictor.cls_score.weight") == (
        ("box_head", "cls_score", "kernel"), "dense")
    assert _only("roi_heads.box.predictor.bbox_pred.bias") == (
        ("box_head", "bbox_pred", "bias"), "copy")


def test_xconv_layouts():
    # GN layout: [conv, GN, ReLU] per block -> indices 0,1,3,4,6,7,...
    assert _only(
        "roi_heads.box.feature_extractor.xconvs.0.weight", xconv_gn=True
    ) == (("box_head", "xconv1", "kernel"), "conv")
    assert _only(
        "roi_heads.box.feature_extractor.xconvs.1.weight", xconv_gn=True
    ) == (("box_head", "xconv1_gn", "gn", "scale"), "copy")
    assert _only(
        "roi_heads.box.feature_extractor.xconvs.3.weight", xconv_gn=True
    ) == (("box_head", "xconv2", "kernel"), "conv")
    # no-GN layout: [conv, ReLU] -> conv indices 0,2,4,...
    assert _only(
        "roi_heads.box.feature_extractor.xconvs.2.weight",
        xconv_gn=False,
    ) == (("box_head", "xconv2", "kernel"), "conv")
    assert _only(
        "roi_heads.box.feature_extractor.xconvs.2.bias", xconv_gn=False
    ) == (("box_head", "xconv2", "bias"), "copy")
    # ReLU index in the no-GN layout maps to nothing
    assert two_stage_name_candidates(
        "roi_heads.box.feature_extractor.xconvs.3.weight",
        xconv_gn=False,
    ) == []


def test_res5_extractor_keys():
    assert _only(
        "roi_heads.box.feature_extractor.head.layer4.0.conv2.weight"
    ) == (("box_head", "layer4_0", "conv2", "kernel"), "conv")
    assert _only(
        "roi_heads.box.feature_extractor.head.layer4.1.bn3.running_mean"
    ) == (("box_head", "layer4_1", "bn3", "running_mean"), "copy")
    assert _only(
        "roi_heads.box.feature_extractor.head.layer4.0.downsample.0.weight"
    ) == (("box_head", "layer4_0", "downsample_conv", "kernel"), "conv")
    assert _only(
        "roi_heads.box.feature_extractor.head.layer4.0.downsample.1.bias"
    ) == (("box_head", "layer4_0", "downsample_bn", "bias"), "copy")


def test_mask_head_keys():
    assert _only("roi_heads.mask.feature_extractor.mask_fcn1.weight") == (
        ("mask_head", "mask_fcn1", "kernel"), "conv")
    assert _only(
        "roi_heads.mask.feature_extractor.mask_fcn2.0.weight"
    ) == (("mask_head", "mask_fcn2", "kernel"), "conv")
    assert _only(
        "roi_heads.mask.feature_extractor.mask_fcn2.1.bias"
    ) == (("mask_head", "mask_fcn2_gn", "gn", "bias"), "copy")
    assert _only("roi_heads.mask.predictor.conv5_mask.weight") == (
        ("mask_head", "conv5_mask", "kernel"), "deconv")
    assert _only("roi_heads.mask.predictor.mask_fcn_logits.weight") == (
        ("mask_head", "mask_fcn_logits", "kernel"), "conv_dropbg")
    assert _only("roi_heads.mask.predictor.mask_fcn_logits.bias") == (
        ("mask_head", "mask_fcn_logits", "bias"), "bias_dropbg")


def test_keypoint_head_keys():
    assert _only(
        "roi_heads.keypoint.feature_extractor.conv_fcn3.weight"
    ) == (("keypoint_head", "conv_fcn3", "kernel"), "conv")
    assert _only(
        "roi_heads.keypoint.predictor.kps_score_lowres.weight"
    ) == (("keypoint_head", "kps_score_lowres", "kernel"), "deconv")


def test_non_two_stage_keys_unmapped():
    assert two_stage_name_candidates("backbone.body.stem.conv1.weight") \
        == []
    assert two_stage_name_candidates(
        "rpn.anchor_generator.cell_anchors.0") == []
    assert two_stage_name_candidates("rpn.head.cls_tower.0.weight") == []


def test_fc_nchw_permutation_roundtrip():
    """The fc6 column permutation must agree with the definition:
    torch flattens pooled features NCHW (c*R*R + h*R + w), ours NHWC
    (h*R*C + w*C + c). Verify on an easily-indexed weight."""
    out_dim, c, r = 3, 4, 2
    w = np.arange(out_dim * c * r * r, dtype=np.float32).reshape(
        out_dim, c * r * r
    )
    k = _fc_nchw_to_nhwc(w, r)
    assert k.shape == (r * r * c, out_dim)
    for o in range(out_dim):
        for cc in range(c):
            for h in range(r):
                for ww in range(r):
                    assert (
                        k[h * r * c + ww * c + cc, o]
                        == w[o, cc * r * r + h * r + ww]
                    )


def test_deconv_transform_shape_and_flip():
    w = np.arange(2 * 3 * 2 * 2, dtype=np.float32).reshape(2, 3, 2, 2)
    k = _deconv_to_flax(w)
    assert k.shape == (2, 2, 2, 3)
    # spatial flip: flax kernel[0,0] is torch kernel[-1,-1]
    assert k[0, 0, 1, 2] == w[1, 2, 1, 1]
    assert k[1, 1, 0, 0] == w[0, 0, 0, 0]

# ---------------------------------------------------------------------
# Round-3 additions: DCN keys (DFConv2d .conv/.offset children,
# layers/misc.py:113-185) and the Caffe2Detectron detection-pickle name
# translation (c2_model_loading.py:12-113 conventions); the numeric
# round-trip proof is tests/test_c2_import_full.py (slow lane).


def test_dcn_backbone_keys():
    from paa_tpu.utils.torch_import import torch_name_to_flax_path

    assert torch_name_to_flax_path(
        "backbone.body.layer2.0.conv2.conv.weight"
    ) == (("backbone", "resnet", "layer2_0", "conv2", "kernel"), "conv")
    assert torch_name_to_flax_path(
        "backbone.body.layer3.5.conv2.offset.weight"
    ) == (
        ("backbone", "resnet", "layer3_5", "conv2", "offset", "kernel"),
        "conv",
    )
    assert torch_name_to_flax_path(
        "module.backbone.body.layer4.1.conv2.offset.bias"
    ) == (
        ("backbone", "resnet", "layer4_1", "conv2", "offset", "bias"),
        "copy",
    )


def test_dcn_tower_keys():
    from paa_tpu.utils.torch_import import torch_name_to_flax_path

    # DFConv2d in the 4th tower block of a GN tower -> Sequential idx 9
    assert torch_name_to_flax_path(
        "rpn.head.cls_tower.9.conv.weight"
    ) == (("head", "cls_tower", "conv3", "kernel"), "conv")
    assert torch_name_to_flax_path(
        "rpn.head.bbox_tower.9.offset.bias"
    ) == (("head", "bbox_tower", "conv3", "offset", "bias"), "copy")


def test_c2_detection_blob_names():
    from paa_tpu.utils.torch_import import c2_blob_to_torch_names

    assert c2_blob_to_torch_names("conv1_w") == [
        "backbone.body.stem.conv1.weight"
    ]
    # res5 may live in the FPN body or the C4 box head
    assert c2_blob_to_torch_names("res5_2_branch2c_bn_b") == [
        "backbone.body.layer4.2.bn3.bias",
        "roi_heads.box.feature_extractor.head.layer4.2.bn3.bias",
    ]
    assert c2_blob_to_torch_names("fpn_inner_res2_2_sum_lateral_w") == [
        "backbone.fpn.fpn_inner1.weight"
    ]
    assert c2_blob_to_torch_names("fpn_res5_2_sum_b") == [
        "backbone.fpn.fpn_layer4.bias"
    ]
    assert c2_blob_to_torch_names("conv_rpn_fpn2_w") == [
        "rpn.head.conv.weight"
    ]
    assert c2_blob_to_torch_names("rpn_bbox_pred_w") == [
        "rpn.head.bbox_pred.weight"
    ]
    assert c2_blob_to_torch_names("fc6_b") == [
        "roi_heads.box.feature_extractor.fc6.bias"
    ]
    assert c2_blob_to_torch_names("_[mask]_fcn3_w") == [
        "roi_heads.mask.feature_extractor.mask_fcn3.weight"
    ]
    assert c2_blob_to_torch_names("mask_fcn_logits_w") == [
        "roi_heads.mask.predictor.mask_fcn_logits.weight"
    ]
    assert c2_blob_to_torch_names("kps_score_lowres_b") == [
        "roi_heads.keypoint.predictor.kps_score_lowres.bias"
    ]
    # GN ImageNet pickles store the stem affine under conv1_gn
    assert c2_blob_to_torch_names("conv1_gn_s") == [
        "backbone.body.stem.bn1.weight"
    ]
    # bookkeeping blobs map to nothing (c2_model_loading.py:119-123)
    assert c2_blob_to_torch_names("res2_0_branch2a_w_momentum") == []
    assert c2_blob_to_torch_names("fc1000_w") == []
    assert c2_blob_to_torch_names("pred_b") == []
