"""Optimizer and LR schedule.

Reproduces the reference solver semantics (paa_core/solver/build.py:7-37,
lr_scheduler.py:10-52) with optax:

- SGD with momentum 0.9; torch ordering (decay added to the gradient
  BEFORE the momentum trace, lr applied after) matches
  ``optax.add_decayed_weights`` -> ``optax.sgd(schedule, momentum)``.
- per-parameter groups: "bias" parameters get BASE_LR * BIAS_LR_FACTOR
  and WEIGHT_DECAY_BIAS (torch keys containing 'bias'; here flax leaves
  named 'bias'); DCN offset convs get DCONV_OFFSETS_LR_FACTOR.
- WarmupMultiStepLR: constant/linear warmup for WARMUP_ITERS then
  GAMMA^bisect(STEPS, iter) decay.
- Freezing (the reference's requires_grad=False: FrozenBatchNorm buffers
  everywhere + FREEZE_CONV_BODY_AT stages, resnet.py:134-143) is a
  'frozen' label whose updates are ``optax.set_to_zero()``; the train
  step additionally stop-gradients those subtrees so XLA never computes
  their gradients at all.
"""

from __future__ import annotations

import re
from bisect import bisect_right

import jax
import optax

_FROZEN_BN_LEAVES = {"weight", "bias", "running_mean", "running_var"}
_BN_MODULE = re.compile(r"^(bn\d|downsample_bn)$")


def make_lr_schedule(cfg):
    base_lr = cfg.SOLVER.BASE_LR
    steps = tuple(cfg.SOLVER.STEPS)
    gamma = cfg.SOLVER.GAMMA
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_method = cfg.SOLVER.WARMUP_METHOD

    import jax.numpy as jnp

    steps_arr = jnp.asarray(steps)

    def schedule(count):
        count = jnp.asarray(count)
        if warmup_method == "constant":
            wf = jnp.where(count < warmup_iters, warmup_factor, 1.0)
        elif warmup_method == "linear":
            alpha = count.astype(jnp.float32) / max(warmup_iters, 1)
            wf = jnp.where(
                count < warmup_iters,
                warmup_factor * (1 - alpha) + alpha,
                1.0,
            )
        else:
            raise ValueError(warmup_method)
        decay = gamma ** jnp.searchsorted(steps_arr, count, side="right")
        return base_lr * wf * decay

    return schedule


def param_labels(params, freeze_at=2):
    """Label every param leaf 'weight' | 'bias' | 'dcn_offset' | 'frozen'."""

    def label(path, _leaf):
        keys = [
            p.key if hasattr(p, "key") else str(p) for p in path
        ]
        leaf_name = keys[-1]
        # FrozenBatchNorm leaves live directly under a bnX module;
        # GroupNorm leaves have an extra 'gn' scope and stay trainable.
        if len(keys) >= 2 and _BN_MODULE.match(keys[-2]):
            if leaf_name in _FROZEN_BN_LEAVES:
                return "frozen"
        # FREEZE_CONV_BODY_AT: stage 0 = stem, stage i = layer{i}
        for comp in keys:
            if comp == "stem" and freeze_at >= 1:
                return "frozen"
            m = re.match(r"^layer(\d)_", comp)
            if m and freeze_at >= int(m.group(1)) + 1:
                return "frozen"
        if any("offset" in comp for comp in keys):
            # reference: offset *bias* compounds BIAS_LR_FACTOR with
            # DCONV_OFFSETS_LR_FACTOR (solver/build.py:16-22)
            return (
                "dcn_offset_bias" if leaf_name == "bias" else "dcn_offset"
            )
        if leaf_name == "bias":
            return "bias"
        return "weight"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg, params):
    """Build the optax transform + the label pytree (for stop-gradient
    partitioning in the train step)."""
    schedule = make_lr_schedule(cfg)
    momentum = cfg.SOLVER.MOMENTUM
    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS
    bias_factor = cfg.SOLVER.BIAS_LR_FACTOR
    dcn_factor = cfg.SOLVER.DCONV_OFFSETS_LR_FACTOR

    def scaled(factor, weight_decay):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(
                lambda c: schedule(c) * factor, momentum=momentum
            ),
        )

    labels = param_labels(params, cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT)
    tx = optax.multi_transform(
        {
            "weight": scaled(1.0, wd),
            "bias": scaled(bias_factor, wd_bias),
            "dcn_offset": scaled(dcn_factor, wd),
            "dcn_offset_bias": scaled(dcn_factor * bias_factor, wd_bias),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return tx, labels
