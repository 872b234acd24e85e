"""Flax MobileNetV2 backbone.

Re-designs reference paa_core/modeling/backbone/mobilenet.py: standard
inverted-residual MNV2 with features returned after blocks
{3, 6, 13, 17} (channels 24, 32, 96, 320 at width 1.0) feeding the
MNV2-FPN-RETINANET wiring (backbone.py:77-99). Uses ReLU6 and train-mode
BatchNorm replaced by FrozenBatchNorm (the reference comment says
"Should freeze bn"; its BatchNorm2d in eval mode behaves identically,
and FrozenBN is the TPU-correct static form).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import FrozenBatchNorm, conv

_SETTINGS = (
    # t (expand), c (channels), n (repeats), s (stride)
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)
_RETURN_INDICES = (3, 6, 13, 17)


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int = 1
    expand_ratio: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        use_res = self.stride == 1 and inp == self.out_channels
        out = x
        if self.expand_ratio != 1:
            out = conv(hidden, 1, dtype=self.dtype, name="pw")(out)
            out = FrozenBatchNorm(hidden, name="pw_bn")(out)
            out = relu6(out)
        out = conv(
            hidden, 3, strides=self.stride, padding=1, groups=hidden,
            dtype=self.dtype, name="dw",
        )(out)
        out = FrozenBatchNorm(hidden, name="dw_bn")(out)
        out = relu6(out)
        out = conv(self.out_channels, 1, dtype=self.dtype,
                   name="pw_linear")(out)
        out = FrozenBatchNorm(self.out_channels, name="pw_linear_bn")(out)
        return x + out if use_res else out


class MobileNetV2(nn.Module):
    width_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        input_channel = int(32 * self.width_mult)
        x = conv(input_channel, 3, strides=2, padding=1,
                 dtype=self.dtype, name="stem_conv")(x.astype(self.dtype))
        x = FrozenBatchNorm(input_channel, name="stem_bn")(x)
        x = relu6(x)

        outputs = []
        idx = 0
        for t, c, n, s in _SETTINGS:
            out_c = int(c * self.width_mult)
            for i in range(n):
                idx += 1
                x = InvertedResidual(
                    out_channels=out_c,
                    stride=s if i == 0 else 1,
                    expand_ratio=t,
                    dtype=self.dtype,
                    name=f"block{idx}",
                )(x)
                if idx in _RETURN_INDICES:
                    outputs.append(x)
        return outputs

    @staticmethod
    def feature_channels(width_mult=1.0):
        return tuple(
            int(c * width_mult) for c in (24, 32, 96, 320)
        )
