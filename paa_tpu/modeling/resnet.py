"""Flax ResNet / ResNeXt backbone.

TPU-native re-design of the reference backbone
(paa_core/modeling/backbone/resnet.py): same architecture family —
7x7/2 stem + 3x3/2 maxpool, bottleneck stages with Caffe-style
stride-in-1x1, FrozenBatchNorm or GroupNorm, ResNeXt via grouped 3x3
convs, per-stage DCN switch — but NHWC, functional, and static-shape.

Stage specs mirror resnet.py:44-80; freezing (FREEZE_CONV_BODY_AT,
resnet.py:134-143) is realized by the solver's trainable-param mask plus
stop_gradient partitioning in the train step rather than requires_grad.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import FrozenBatchNorm, GroupNorm32, conv, max_pool_3x3_s2

# (block counts per stage, return_features per stage)
STAGE_SPECS = {
    "R-50-C4": ((3, 4, 6), (False, False, True)),
    "R-50-C5": ((3, 4, 6, 3), (False, False, False, True)),
    "R-101-C4": ((3, 4, 23), (False, False, True)),
    "R-101-C5": ((3, 4, 23, 3), (False, False, False, True)),
    "R-50-FPN": ((3, 4, 6, 3), (True, True, True, True)),
    "R-50-FPN-RETINANET": ((3, 4, 6, 3), (True, True, True, True)),
    "R-101-FPN": ((3, 4, 23, 3), (True, True, True, True)),
    "R-101-FPN-RETINANET": ((3, 4, 23, 3), (True, True, True, True)),
    "R-152-FPN": ((3, 8, 36, 3), (True, True, True, True)),
    "R-152-FPN-RETINANET": ((3, 8, 36, 3), (True, True, True, True)),
}


def make_norm(kind: str, features: int, name: str):
    if kind == "frozen_bn":
        return FrozenBatchNorm(features, name=name)
    elif kind == "gn":
        return GroupNorm32(features, name=name)
    elif kind == "sync_bn":
        from .layers import SyncBatchNorm

        return SyncBatchNorm(features, name=name)
    raise ValueError(kind)


class Stem(nn.Module):
    """7x7/2 conv + norm + relu + 3x3/2 maxpool (resnet.py:345-364).

    With ``space_to_depth`` the 7x7/2 conv on a 3-channel image (2.5%
    MXU utilization, 8.2 ms/batch8 at 800x1344 on v5e) is replaced by
    the EXACT equivalent 4x4/1 conv on the 2x2-space-to-depth input
    (12 channels, ~3.4 ms): pad the kernel 7->8 with a leading zero
    row/col, then K2[a,b,(dy,dx,c)] = W8[2a+dy, 2b+dx, c]. Weight
    import applies the same transform (utils/torch_import.py
    stem_kernel_to_s2d); exactness is covered by the torch backbone
    parity tests.
    """

    out_channels: int = 64
    norm: str = "frozen_bn"
    space_to_depth: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.space_to_depth:
            x = x.astype(self.dtype)  # halve the transpose traffic
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h // 2, w // 2, 4 * c
            )
            x = conv(self.out_channels, 4, strides=1,
                     padding=((2, 1), (2, 1)), dtype=self.dtype,
                     name="conv1")(x)
        else:
            x = conv(self.out_channels, 7, strides=2, padding=3,
                     dtype=self.dtype, name="conv1")(x.astype(self.dtype))
        x = make_norm(self.norm, self.out_channels, "bn1")(x)
        x = nn.relu(x)
        return max_pool_3x3_s2(x)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(groups, optional stride/dilation/DCN) -> 1x1 with residual
    (resnet.py:238-341)."""

    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    num_groups: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    norm: str = "frozen_bn"
    with_dcn: bool = False
    with_modulated_dcn: bool = False
    deformable_groups: int = 1
    dcn_mode: Any = None
    dcn_window_margin: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        identity = x

        stride = 1 if self.dilation > 1 else self.stride
        stride_1x1, stride_3x3 = (
            (stride, 1) if self.stride_in_1x1 else (1, stride)
        )

        out = conv(
            self.bottleneck_channels, 1, strides=stride_1x1,
            dtype=self.dtype, name="conv1",
        )(x)
        out = make_norm(self.norm, self.bottleneck_channels, "bn1")(out)
        out = nn.relu(out)

        if self.with_dcn:
            from ..ops.dcn import DeformConv

            out = DeformConv(
                features=self.bottleneck_channels,
                kernel_size=3,
                strides=stride_3x3,
                padding=self.dilation,
                dilation=self.dilation,
                groups=self.num_groups,
                deformable_groups=self.deformable_groups,
                modulated=self.with_modulated_dcn,
                mode=self.dcn_mode,
                window_margin=self.dcn_window_margin,
                name="conv2",
            )(out)
        else:
            out = conv(
                self.bottleneck_channels,
                3,
                strides=stride_3x3,
                padding=self.dilation,
                groups=self.num_groups,
                dilation=self.dilation,
                dtype=self.dtype,
                name="conv2",
            )(out)
        out = make_norm(self.norm, self.bottleneck_channels, "bn2")(out)
        out = nn.relu(out)

        out = conv(self.out_channels, 1, dtype=self.dtype, name="conv3")(out)
        out = make_norm(self.norm, self.out_channels, "bn3")(out)

        if in_channels != self.out_channels:
            down_stride = stride if self.dilation == 1 else 1
            identity = conv(
                self.out_channels, 1, strides=down_stride,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = make_norm(
                self.norm, self.out_channels, "downsample_bn"
            )(identity)

        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Config-shaped ResNet body returning C2..C5 (NHWC)."""

    body: str = "R-50-FPN-RETINANET"
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    norm: str = "frozen_bn"
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    with_modulated_dcn: bool = False
    deformable_groups: int = 1
    res5_dilation: int = 1
    space_to_depth: bool = False
    dcn_mode: Any = None
    dcn_window_margin: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block_counts, return_features = STAGE_SPECS[self.body]
        x = Stem(
            self.stem_out_channels, norm=self.norm,
            space_to_depth=self.space_to_depth, dtype=self.dtype,
            name="stem",
        )(x)

        stage2_bottleneck = self.num_groups * self.width_per_group
        outputs = []
        for i, block_count in enumerate(block_counts):
            stage_index = i + 1  # layer1..layer4
            factor = 2 ** i
            bottleneck_channels = stage2_bottleneck * factor
            out_channels = self.res2_out_channels * factor
            first_stride = 1 if stage_index == 1 else 2
            dilation = (
                self.res5_dilation if stage_index == 4 else 1
            )
            with_dcn = (
                self.stage_with_dcn[i]
                if i < len(self.stage_with_dcn)
                else False
            )
            for b in range(block_count):
                x = Bottleneck(
                    bottleneck_channels=bottleneck_channels,
                    out_channels=out_channels,
                    stride=first_stride if b == 0 else 1,
                    num_groups=self.num_groups,
                    stride_in_1x1=self.stride_in_1x1,
                    dilation=dilation,
                    norm=self.norm,
                    with_dcn=with_dcn,
                    with_modulated_dcn=self.with_modulated_dcn,
                    deformable_groups=self.deformable_groups,
                    dcn_mode=self.dcn_mode,
                    dcn_window_margin=self.dcn_window_margin,
                    dtype=self.dtype,
                    name=f"layer{stage_index}_{b}",
                )(x)
            if return_features[i]:
                outputs.append(x)
        return outputs


def resnet_from_cfg(cfg, dtype=jnp.float32):
    trans = cfg.MODEL.RESNETS.TRANS_FUNC
    norm = "gn" if trans == "BottleneckWithGN" else "frozen_bn"
    if cfg.MODEL.USE_SYNCBN:
        # reference: SyncBatchNorm.convert_sync_batchnorm over the model
        norm = "sync_bn"
    return ResNet(
        body=cfg.MODEL.BACKBONE.CONV_BODY,
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        norm=norm,
        stage_with_dcn=tuple(cfg.MODEL.RESNETS.STAGE_WITH_DCN),
        with_modulated_dcn=cfg.MODEL.RESNETS.WITH_MODULATED_DCN,
        deformable_groups=cfg.MODEL.RESNETS.DEFORMABLE_GROUPS,
        res5_dilation=cfg.MODEL.RESNETS.RES5_DILATION,
        space_to_depth=cfg.TPU.SPACE_TO_DEPTH,
        dcn_mode=cfg.TPU.DCN_MODE,
        dcn_window_margin=cfg.TPU.DCN_WINDOW_MARGIN,
        dtype=dtype,
    )
