"""Flax FPN with RetinaNet-style P6/P7 extra levels.

Re-designs reference paa_core/modeling/backbone/fpn.py: lateral 1x1 +
nearest top-down + 3x3 output convs; ``LastLevelP6P7`` (fpn.py:86-103)
adds stride-2 convs from C5 or P5. The PAA configs use the
"R-*-FPN-RETINANET" wiring (backbone.py:52-73): the C2 lateral is skipped
(in_channels_list[0] = 0) and P6/P7 come from P5 (RETINANET.USE_C5=False).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm32, conv, kaiming_uniform_a1


def _upsample_nearest(x, target_hw):
    """Nearest-neighbour resize to (H, W), matching
    F.interpolate(mode='nearest') for the exact-2x case that FPN uses."""
    b, h, w, c = x.shape
    th, tw = target_hw
    if (th, tw) == (2 * h, 2 * w):
        # exact 2x: repeat, avoiding gather
        x = jnp.repeat(x, 2, axis=1)
        return jnp.repeat(x, 2, axis=2)
    return jax.image.resize(x, (b, th, tw, c), method="nearest")


class FPN(nn.Module):
    """Takes [C2, C3, C4, C5]; returns (P3, P4, P5, P6, P7) when
    ``use_p6p7`` else (P2..P5, pool)."""

    out_channels: int = 256
    skip_c2: bool = True
    use_p6p7: bool = True
    p6p7_from_c5: bool = False
    use_gn: bool = False
    use_relu: bool = False
    dtype: Any = jnp.float32

    def _block(self, x, kernel, padding, name):
        """conv_with_kaiming_uniform(use_gn, use_relu) of the reference
        make_layers.py: conv (bias only without GN) -> GN -> ReLU."""
        x = conv(
            self.out_channels, kernel, padding=padding,
            use_bias=not self.use_gn, dtype=self.dtype, name=name,
        )(x)
        if self.use_gn:
            x = GroupNorm32(self.out_channels, name=f"{name}_gn")(x)
        if self.use_relu:
            x = nn.relu(x)
        return x

    @nn.compact
    def __call__(self, features):
        feats = list(features)
        start = 1 if self.skip_c2 else 0
        used = feats[start:]
        n = len(used)

        laterals = [
            self._block(f, 1, 0, f"fpn_inner{start + i + 1}")
            for i, f in enumerate(used)
        ]

        # top-down pathway
        merged = [None] * n
        merged[-1] = laterals[-1]
        for i in range(n - 2, -1, -1):
            top = _upsample_nearest(merged[i + 1], laterals[i].shape[1:3])
            merged[i] = laterals[i] + top

        results = [
            self._block(m, 3, 1, f"fpn_layer{start + i + 1}")
            for i, m in enumerate(merged)
        ]

        if self.use_p6p7:
            x = feats[-1] if self.p6p7_from_c5 else results[-1]
            p6 = conv(self.out_channels, 3, strides=2, padding=1,
                      use_bias=True, dtype=self.dtype, name="p6")(x)
            p7 = conv(self.out_channels, 3, strides=2, padding=1,
                      use_bias=True, dtype=self.dtype, name="p7")(nn.relu(p6))
            results.extend([p6, p7])
        else:
            results.append(
                nn.max_pool(results[-1], (1, 1), strides=(2, 2))
            )
        return tuple(results)


class ResNetFPNBackbone(nn.Module):
    """body + fpn, mirroring build_resnet_fpn_p3p7_backbone
    (reference backbone.py:49-73)."""

    resnet: nn.Module
    out_channels: int = 256
    skip_c2: bool = True
    use_p6p7: bool = True
    p6p7_from_c5: bool = False
    use_gn: bool = False
    use_relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = self.resnet(x)
        return FPN(
            out_channels=self.out_channels,
            skip_c2=self.skip_c2,
            use_p6p7=self.use_p6p7,
            p6p7_from_c5=self.p6p7_from_c5,
            use_gn=self.use_gn,
            use_relu=self.use_relu,
            dtype=self.dtype,
            name="fpn",
        )(features)
