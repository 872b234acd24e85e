"""FBNet / ChamNet mobile backbone family, TPU-native.

Re-designs reference paa_core/modeling/backbone/fbnet*.py (fbnet.py,
fbnet_builder.py 829 LoC, fbnet_modeldef.py): inverted-residual (MBConv)
architectures described by per-stage tables, a width-scaling builder, a
single-level trunk plus RPN/ROI head stages carved out of the same table.

Design differences from the reference:
- the arch tables are flat per-stage ``(op, t, c, n, s)`` tuples (the
  reference splits op types and t/c/n/s into two parallel structures
  that unify_arch_def zips back together);
- blocks are Flax modules with channel inference from input shape;
- ``bn`` normalization maps to FrozenBatchNorm (identity-init running
  stats, like every detection backbone here; SURVEY.md notes the
  reference's train-mode BN/SyncBN is unused by its shipped configs)
  and ``gn`` to GroupNorm;
- negative stride -2 means x2 nearest upsample, as in the reference
  (_get_upsample_op).

Architecture hyperparameters (FBNet-"default", xirb16d_dsmask,
MobileNetV2, ChamNet v1a/v2) follow the published tables in
fbnet_modeldef.py:11-218.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import FrozenBatchNorm, GroupNorm32, conv, kaiming_uniform_a1

# Per stage: list of (op, expansion t, channels c, repeats n, stride s).
# Stage roles (indices into "stages"): backbone / rpn / bbox / mask.
FBNET_ARCHS = {
    "default": dict(
        first=(32, 2),
        stages=[
            [("ir_k3", 1, 16, 1, 1)],
            [("ir_k3", 6, 24, 2, 2)],
            [("ir_k3", 6, 32, 3, 2)],
            [("ir_k3", 6, 64, 4, 2), ("ir_k3", 6, 96, 3, 1)],
            [("ir_k3", 4, 160, 1, 2), ("ir_k3", 6, 160, 2, 1),
             ("ir_k3", 6, 240, 1, 1)],
            [("ir_k3", 6, 96, 3, 1)],
            [("ir_k3", 4, 160, 1, 1), ("ir_k3", 6, 160, 3, 1),
             ("ir_k3", 3, 80, 1, -2)],
        ],
        last=(0, 0.0),
        backbone=(0, 1, 2, 3), rpn=(5,), bbox=(4,), mask=(6,),
    ),
    "xirb16d_dsmask": dict(
        first=(16, 2),
        stages=[
            [("ir_k3", 1, 16, 1, 1)],
            [("ir_k3", 6, 32, 2, 2)],
            [("ir_k3", 6, 48, 3, 2)],
            [("ir_k3", 6, 96, 4, 2), ("ir_k3", 6, 128, 3, 1)],
            [("ir_k3", 4, 128, 1, 2), ("ir_k3", 6, 128, 2, 1),
             ("ir_k3", 6, 160, 1, 1)],
            [("ir_k3", 4, 128, 1, 2), ("ir_k3", 6, 128, 2, 1),
             ("ir_k3", 6, 128, 1, -2), ("ir_k3", 3, 64, 1, -2)],
            [("ir_k3", 6, 128, 3, 1)],
        ],
        last=(0, 0.0),
        backbone=(0, 1, 2, 3), rpn=(6,), bbox=(4,), mask=(5,),
    ),
    "mobilenet_v2": dict(
        first=(32, 2),
        stages=[
            [("ir_k3", 1, 16, 1, 1)],
            [("ir_k3", 6, 24, 2, 2)],
            [("ir_k3", 6, 32, 3, 2)],
            [("ir_k3", 6, 64, 4, 2), ("ir_k3", 6, 96, 3, 1)],
            [("ir_k3", 6, 160, 3, 1), ("ir_k3", 6, 320, 1, 1)],
        ],
        last=(0, 0.0),
        backbone=(0, 1, 2, 3), bbox=(4,),
    ),
    "cham_v1a": dict(
        first=(32, 2),
        stages=[
            [("ir_k3", 1, 24, 1, 1)],
            [("ir_k7", 4, 48, 2, 2)],
            [("ir_k3", 7, 64, 5, 2)],
            [("ir_k5", 12, 56, 7, 2), ("ir_k3", 8, 88, 5, 1)],
            [("ir_k3", 7, 152, 4, 2), ("ir_k3", 10, 104, 1, 1)],
            [("ir_k3", 8, 88, 3, 1)],
        ],
        last=(0, 0.0),
        backbone=(0, 1, 2, 3), rpn=(5,), bbox=(4,),
    ),
    "cham_v2": dict(
        first=(32, 2),
        stages=[
            [("ir_k3", 1, 24, 1, 1)],
            [("ir_k5", 8, 32, 4, 2)],
            [("ir_k7", 5, 48, 6, 2)],
            [("ir_k5", 9, 56, 3, 2), ("ir_k3", 6, 56, 6, 1)],
            [("ir_k3", 2, 160, 6, 2), ("ir_k3", 6, 112, 1, 1)],
            [("ir_k3", 6, 56, 1, 1)],
        ],
        last=(0, 0.0),
        backbone=(0, 1, 2, 3), rpn=(5,), bbox=(4,),
    ),
}

_OP_KERNEL = {"ir_k1": 1, "ir_k3": 3, "ir_k5": 5, "ir_k7": 7}


def divisible_width(width: int, divisor: int) -> int:
    """fbnet_builder._get_divisible_by(width, divisor, divisor), exactly:
    already-divisible widths pass through; otherwise py2 round-half-up of
    width/divisor times divisor, with the reference's ``or min_val``
    quirk (a 0 rounding yields divisor*divisor)."""
    import math

    w = int(width)
    if divisor <= 0 or w % divisor == 0:
        return w
    r = math.floor(w / divisor + 0.5)  # py2 round for positive values
    if r == 0:
        r = divisor  # min_val fallback
    return r * divisor


def expand_stage(stage) -> list:
    """(op, t, c, n, s) groups -> one (op, t, c, s) per block (stride
    applies to the first repeat only; fbnet_builder._expand_block_cfg)."""
    out = []
    for op, t, c, n, s in stage:
        for i in range(n):
            out.append((op, t, c, s if i == 0 else 1))
    return out


def expanded_blocks(arch: dict, role: str) -> list:
    """Flat block list for a role ('backbone' | 'rpn' | 'bbox' | 'mask')."""
    blocks = []
    for si in arch[role]:
        blocks.extend(expand_stage(arch["stages"][si]))
    return blocks


class ConvNormRelu(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    use_relu: bool = True
    use_norm: bool = True
    bn_type: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = conv(
            self.out_channels, self.kernel, strides=self.stride,
            padding=self.kernel // 2, groups=self.groups, use_bias=False,
            kernel_init=kaiming_uniform_a1, dtype=self.dtype, name="conv",
        )(x)
        if self.use_norm:
            if self.bn_type == "gn":
                x = GroupNorm32(self.out_channels, name="gn")(x)
            else:
                x = FrozenBatchNorm(self.out_channels, name="bn")(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class SEModule(nn.Module):
    """Squeeze-excitation (fbnet_builder.SEModule: /4 reduction)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = max(self.channels // 4, 1)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(
            conv(mid, 1, use_bias=True, dtype=self.dtype, name="fc1")(s)
        )
        s = nn.sigmoid(
            conv(self.channels, 1, use_bias=True, dtype=self.dtype,
                 name="fc2")(s)
        )
        return x * s


class IRFBlock(nn.Module):
    """Inverted-residual block (fbnet_builder.IRFBlock): 1x1 expand +
    ReLU, kxk depthwise (stride or x2 upsample for stride -2), 1x1
    linear project; residual when stride 1 and channels match."""

    out_channels: int
    expansion: int
    stride: int
    kernel: int = 3
    pw_group: int = 1
    shuffle: bool = False
    se: bool = False
    width_divisor: int = 1
    dw_skip_norm: bool = True   # cfg.MODEL.FBNET.DW_CONV_SKIP_BN default
    dw_skip_relu: bool = True
    bn_type: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = divisible_width(
            int(in_ch * self.expansion), self.width_divisor
        )
        use_res = self.stride == 1 and in_ch == self.out_channels

        y = ConvNormRelu(
            mid, kernel=1, groups=self.pw_group, bn_type=self.bn_type,
            dtype=self.dtype, name="pw",
        )(x)
        if self.shuffle and self.pw_group > 1:
            b, h, w, c = y.shape
            y = y.reshape(b, h, w, self.pw_group, c // self.pw_group)
            y = jnp.swapaxes(y, 3, 4).reshape(b, h, w, c)
        stride = self.stride
        if stride < 0:  # nearest x|stride| upsample, then stride-1 dw
            b, h, w, c = y.shape
            f = -stride
            y = jnp.repeat(jnp.repeat(y, f, axis=1), f, axis=2)
            stride = 1
        if self.kernel > 1:
            y = ConvNormRelu(
                mid, kernel=self.kernel, stride=stride, groups=mid,
                use_norm=not self.dw_skip_norm,
                use_relu=not self.dw_skip_relu,
                bn_type=self.bn_type, dtype=self.dtype, name="dw",
            )(y)
        y = ConvNormRelu(
            self.out_channels, kernel=1, groups=self.pw_group,
            use_relu=False, bn_type=self.bn_type, dtype=self.dtype,
            name="pwl",
        )(y)
        if use_res:
            y = y + x
        if self.se:
            y = SEModule(self.out_channels, dtype=self.dtype, name="se")(y)
        return y


class FBNetStages(nn.Module):
    """A sequence of expanded blocks (builder.add_blocks)."""

    blocks: Tuple[Tuple[str, int, int, int], ...]  # (op, t, c, s)
    width_ratio: float = 1.0
    width_divisor: int = 1
    bn_type: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, (op, t, c, s) in enumerate(self.blocks):
            out_ch = divisible_width(
                int(c * self.width_ratio), self.width_divisor
            )
            x = IRFBlock(
                out_channels=out_ch,
                expansion=t,
                stride=s,
                kernel=_OP_KERNEL[op],
                width_divisor=self.width_divisor,
                bn_type=self.bn_type,
                dtype=self.dtype,
                name=f"block{i}",
            )(x)
        return x


class FBNetTrunk(nn.Module):
    """First conv + backbone stages -> ONE feature map (the reference
    FBNet trunk is single-level, stride 16 for every shipped arch)."""

    arch: str = "default"
    width_ratio: float = 1.0
    width_divisor: int = 1
    bn_type: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        arch = FBNET_ARCHS[self.arch]
        first_c, first_s = arch["first"]
        first_ch = divisible_width(
            int(first_c * self.width_ratio), self.width_divisor
        )
        x = ConvNormRelu(
            first_ch, kernel=3, stride=first_s, bn_type=self.bn_type,
            dtype=self.dtype, name="first",
        )(x.astype(self.dtype))
        x = FBNetStages(
            blocks=tuple(expanded_blocks(arch, "backbone")),
            width_ratio=self.width_ratio,
            width_divisor=self.width_divisor,
            bn_type=self.bn_type,
            dtype=self.dtype,
            name="stages",
        )(x)
        return [x]


def fbnet_out_channels(arch_name, role, width_ratio=1.0, width_divisor=1):
    """Output channels after a role's blocks (builder.last_depth)."""
    blocks = expanded_blocks(FBNET_ARCHS[arch_name], role)
    _, _, c, _ = blocks[-1]
    return divisible_width(int(c * width_ratio), width_divisor)


def fbnet_trunk_stride(arch_name):
    arch = FBNET_ARCHS[arch_name]
    s = arch["first"][1]
    for _, _, _, bs in expanded_blocks(arch, "backbone"):
        if bs > 0:
            s *= bs
        elif bs < 0:
            s //= -bs
    return s


def fbnet_from_cfg(cfg, dtype=jnp.float32):
    f = cfg.MODEL.FBNET
    return FBNetTrunk(
        arch=f.ARCH,
        width_ratio=f.SCALE_FACTOR,
        width_divisor=f.WIDTH_DIVISOR,
        bn_type=f.BN_TYPE,
        dtype=dtype,
    )


class FBNetRPNHead(nn.Module):
    """FBNet RPN head (fbnet.py FBNetRPNHead + rpn.RPNHeadConvRegressor):
    the arch's 'rpn' stage blocks on each feature map, then 1x1
    objectness / box-delta convs."""

    arch: str = "default"
    num_anchors: int = 15
    width_ratio: float = 1.0
    width_divisor: int = 1
    bn_type: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        from .layers import head_normal_init

        stages = FBNetStages(
            blocks=tuple(expanded_blocks(FBNET_ARCHS[self.arch], "rpn")),
            width_ratio=self.width_ratio,
            width_divisor=self.width_divisor,
            bn_type=self.bn_type,
            dtype=self.dtype,
            name="rpn_stages",
        )
        cls_logits = conv(
            self.num_anchors, 1, use_bias=True,
            kernel_init=head_normal_init, dtype=self.dtype,
            name="cls_logits",
        )
        bbox_pred = conv(
            self.num_anchors * 4, 1, use_bias=True,
            kernel_init=head_normal_init, dtype=self.dtype,
            name="bbox_pred",
        )
        logits, reg = [], []
        for f in features:
            t = stages(f)
            b = f.shape[0]
            logits.append(cls_logits(t).reshape(b, -1))
            reg.append(bbox_pred(t).reshape(b, -1, 4))
        return {
            "objectness": jnp.concatenate(logits, axis=1),
            "box_regression": jnp.concatenate(reg, axis=1),
        }


class FBNetMaskHead(nn.Module):
    """FBNet mask head (fbnet.py FBNetROIHead head_name='mask' +
    MaskRCNNC4Predictor): pool the trunk map, run the arch's 'mask'
    stage blocks (which upsample via negative strides), then deconv x2
    and a 1x1 conv to per-class mask logits."""

    arch: str = "default"
    num_classes: int = 80  # WITHOUT background
    resolution: int = 14
    scale: float = 1.0 / 16
    sampling_ratio: int = 2
    width_ratio: float = 1.0
    width_divisor: int = 1
    bn_type: str = "bn"
    use_deconv: bool = True  # False = MaskRCNNConv1x1Predictor (dsmask
    # archs upsample inside the 'mask' stage via negative strides)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois, roi_batch_idx):
        from ..ops.roi_align import roi_align
        from .layers import kaiming_uniform_a1

        x = roi_align(
            features[0], rois, roi_batch_idx,
            (self.resolution, self.resolution), self.scale,
            self.sampling_ratio,
        )
        x = FBNetStages(
            blocks=tuple(expanded_blocks(FBNET_ARCHS[self.arch], "mask")),
            width_ratio=self.width_ratio,
            width_divisor=self.width_divisor,
            bn_type=self.bn_type,
            dtype=self.dtype,
            name="mask_stages",
        )(x)
        if self.use_deconv:
            x = nn.ConvTranspose(
                x.shape[-1], (2, 2), strides=(2, 2),
                kernel_init=kaiming_uniform_a1, name="conv5_mask",
            )(x.astype(jnp.float32))
            x = nn.relu(x)
        return conv(
            self.num_classes, 1, use_bias=True,
            kernel_init=nn.initializers.normal(0.001),
            name="mask_fcn_logits",
        )(x)


class FBNetROIBoxHead(nn.Module):
    """FBNet box head (fbnet.py FBNetROIHead with head_name='bbox' +
    FastRCNNPredictor): pool the single trunk map, run the arch's
    'bbox' stage blocks, average pool, linear cls/box predictors."""

    arch: str = "default"
    num_classes: int = 81  # INCLUDING background
    resolution: int = 6
    scale: float = 1.0 / 16
    sampling_ratio: int = 2
    width_ratio: float = 1.0
    width_divisor: int = 1
    bn_type: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, proposals, proposal_batch_idx):
        from flax import linen as fnn

        from ..ops.roi_align import roi_align

        x = roi_align(
            features[0], proposals, proposal_batch_idx,
            (self.resolution, self.resolution), self.scale,
            self.sampling_ratio,
        )
        x = FBNetStages(
            blocks=tuple(expanded_blocks(FBNET_ARCHS[self.arch], "bbox")),
            width_ratio=self.width_ratio,
            width_divisor=self.width_divisor,
            bn_type=self.bn_type,
            dtype=self.dtype,
            name="bbox_stages",
        )(x)
        x = x.astype(jnp.float32).mean(axis=(1, 2))
        r = x.shape[0]
        cls_logits = fnn.Dense(
            self.num_classes,
            kernel_init=fnn.initializers.normal(0.01),
            name="cls_score",
        )(x)
        box_deltas = fnn.Dense(
            self.num_classes * 4,
            kernel_init=fnn.initializers.normal(0.001),
            name="bbox_pred",
        )(x)
        return cls_logits, box_deltas.reshape(r, self.num_classes, 4)
