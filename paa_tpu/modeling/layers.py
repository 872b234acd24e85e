"""Shared Flax layers.

TPU-native counterparts of the reference's paa_core/layers: FrozenBatchNorm2d
(layers/batch_norm.py:6-24 — note: NO epsilon, matching the reference
exactly), GroupNorm towers, the per-level learnable ``Scale``
(layers/misc.py Scale), and conv initializers matching the reference's
kaiming-uniform(a=1) / normal(0.01) conventions.

Layout: NHWC everywhere (TPU-native); torch NCHW weights are transposed at
import time.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# kaiming_uniform(a=1) as used for backbone/FPN convs
# (reference resnet.py:319-320, make_layers.py conv_with_kaiming_uniform):
# bound = sqrt(3 / fan_in)  ==  variance_scaling(1.0, fan_in, uniform).
kaiming_uniform_a1 = nn.initializers.variance_scaling(
    1.0, "fan_in", "uniform"
)
# head convs: normal(std=0.01) (reference paa.py:81)
head_normal_init = nn.initializers.normal(stddev=0.01)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine parameters.

    y = x * (weight * rsqrt(running_var)) + (bias - mean * scale)
    — exactly reference layers/batch_norm.py:19-24 (no epsilon). The four
    tensors live in params but are excluded from optimization by the
    solver's trainable mask (matching buffers + requires_grad=False).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param(
            "running_mean", nn.initializers.zeros, (self.features,)
        )
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight * jax.lax.rsqrt(var)
        shift = bias - mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class SyncBatchNorm(nn.Module):
    """Trainable BatchNorm whose statistics are GLOBAL-batch statistics.

    The reference wraps models in torch.nn.SyncBatchNorm when
    MODEL.USE_SYNCBN (tools/train_net.py:35-38) so BN stats sync across
    GPUs. Under pjit the train step is ONE program over the global
    (data-sharded) batch, so plain jnp.mean/var over the batch axis IS
    the cross-replica reduction — no axis_name or explicit collective
    needed. Training (apply with mutable=['batch_stats']) normalizes by
    batch statistics and updates the running stats; eval (immutable
    apply) uses the running averages.
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        train = self.is_mutable_collection("batch_stats")
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            name="bn",
        )(x)


class SupergroupConv(nn.Module):
    """Grouped conv lowered as 128-wide block-diagonal supergroups.

    EXACT reformulation of ``nn.Conv(feature_group_count=groups)`` for
    MXU efficiency (ops/groupconv.py): parameters keep the grouped
    layout/naming (``kernel`` (kh, kw, Cin/groups, features), optional
    ``bias``) so checkpoints, torch import, and tests are oblivious; the
    block-diagonal expansion happens at call time (negligible cost, and
    constant-folded for frozen weights).
    """

    features: int
    kernel_size: tuple
    strides: tuple
    padding: tuple
    groups: int
    use_bias: bool = False
    kernel_dilation: tuple = (1, 1)
    kernel_init: Any = kaiming_uniform_a1
    bias_init: Any = nn.initializers.zeros
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from ..ops.groupconv import (
            expand_supergroup_kernel,
            supergroup_plan,
        )

        cin_g = x.shape[-1] // self.groups
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (*self.kernel_size, cin_g, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        plan = supergroup_plan(
            self.groups, cin_g, self.features // self.groups
        )
        wk = kernel.astype(dtype)
        fgc = self.groups
        if plan is not None:
            m, fgc = plan
            wk = expand_supergroup_kernel(wk, self.groups, m)
        out = jax.lax.conv_general_dilated(
            x.astype(dtype),
            wk,
            self.strides,
            self.padding,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=fgc,
        )
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), jnp.float32
            )
            out = out + bias.astype(out.dtype)
        return out


def conv(
    features,
    kernel_size,
    strides=1,
    padding=0,
    groups=1,
    use_bias=False,
    dilation=1,
    kernel_init=kaiming_uniform_a1,
    bias_init=nn.initializers.zeros,
    dtype=None,
    name=None,
    supergroup=True,
):
    """Conv2D with torch-style explicit integer padding (NHWC).

    ``dtype`` is the compute dtype (params stay float32); pass
    jnp.bfloat16 to run the conv on the MXU in bf16. Grouped convs with
    narrow groups (ResNeXt) are lowered block-diagonally via
    SupergroupConv unless ``supergroup=False`` (exact either way; see
    ops/groupconv.py).
    """
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if isinstance(strides, int):
        strides = (strides, strides)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if groups > 1 and supergroup:
        # input channels are only known at call time; SupergroupConv
        # applies supergroup_plan then (falling back to the plain
        # grouped lowering when the plan declines, e.g. depthwise)
        return SupergroupConv(
            features=features,
            kernel_size=kernel_size,
            strides=strides,
            padding=padding,
            groups=groups,
            use_bias=use_bias,
            kernel_dilation=dilation,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=dtype,
            name=name,
        )
    return nn.Conv(
        features=features,
        kernel_size=kernel_size,
        strides=strides,
        padding=padding,
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_dilation=dilation,
        kernel_init=kernel_init,
        bias_init=bias_init,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class _GNAffine(nn.Module):
    """Bare GroupNorm affine params (scale, bias) under the same child
    scope/naming as nn.GroupNorm, for the fused kernel path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,)
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm with the reference's defaults (32 groups, eps 1e-5;
    make_layers.py group_norm).

    ``fused_relu=True`` computes GroupNorm + ReLU in one HBM pass via
    the Pallas kernel (ops/fused_gn.py) — the caller must then NOT
    apply a separate relu. The parameter tree (gn/scale, gn/bias) is
    identical in both modes, so checkpoints and the torch importer are
    oblivious to the flag."""

    features: int
    num_groups: int = 32
    epsilon: float = 1e-5
    fused_relu: bool = False

    @nn.compact
    def __call__(self, x):
        if not self.fused_relu:
            return nn.GroupNorm(
                num_groups=self.num_groups, epsilon=self.epsilon,
                name="gn",
            )(x)
        from ..ops.fused_gn import fused_group_norm_relu

        scale, bias = _GNAffine(self.features, name="gn")()
        return fused_group_norm_relu(
            x, scale, bias, self.num_groups, self.epsilon, True
        )


class Scale(nn.Module):
    """Learnable scalar multiplier (reference layers Scale, init 1.0)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale",
            lambda key: jnp.asarray(self.init_value, dtype=jnp.float32),
        )
        return x * scale.astype(x.dtype)


def max_pool_3x3_s2(x):
    """3x3/2 max pool with pad 1, matching torch F.max_pool2d(x, 3, 2, 1)."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )
