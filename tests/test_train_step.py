"""Train-step tests: solver semantics, freezing, and the 8-virtual-device
data-parallel dry run (the multi-chip path the driver also validates)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paa_tpu.config import get_cfg
from paa_tpu.solver import make_lr_schedule, make_optimizer, param_labels


def test_lr_schedule_matches_reference():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.STEPS = (60000, 80000)
    cfg.SOLVER.WARMUP_METHOD = "constant"
    cfg.SOLVER.WARMUP_FACTOR = 1.0 / 3
    cfg.SOLVER.WARMUP_ITERS = 500
    sched = make_lr_schedule(cfg)
    np.testing.assert_allclose(float(sched(0)), 0.01 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(499)), 0.01 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(500)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(60000)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(sched(80001)), 0.0001, rtol=1e-6)


def test_linear_warmup():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_METHOD = "linear"
    sched = make_lr_schedule(cfg)
    np.testing.assert_allclose(float(sched(0)), 0.01 / 3, rtol=1e-6)
    np.testing.assert_allclose(
        float(sched(250)), 0.01 * ((1 / 3) * 0.5 + 0.5), rtol=1e-6
    )


def test_param_labels():
    params = {
        "backbone": {
            "resnet": {
                "stem": {"conv1": {"kernel": np.zeros(1)},
                         "bn1": {"weight": np.zeros(1),
                                 "running_mean": np.zeros(1)}},
                "layer1_0": {"conv1": {"kernel": np.zeros(1)},
                             "bn1": {"weight": np.zeros(1)}},
                "layer2_0": {"conv1": {"kernel": np.zeros(1)},
                             "bn2": {"running_var": np.zeros(1)},
                             "gn_mod": {"gn": {"bias": np.zeros(1)}}},
            },
            "fpn": {"p6": {"kernel": np.zeros(1), "bias": np.zeros(1)}},
        },
        "head": {
            "cls_tower": {"conv0": {"kernel": np.zeros(1),
                                    "bias": np.zeros(1)},
                          "gn0": {"gn": {"scale": np.zeros(1),
                                         "bias": np.zeros(1)}}},
        },
    }
    labels = param_labels(params, freeze_at=2)
    r = labels["backbone"]["resnet"]
    assert r["stem"]["conv1"]["kernel"] == "frozen"
    assert r["stem"]["bn1"]["weight"] == "frozen"
    assert r["layer1_0"]["conv1"]["kernel"] == "frozen"
    assert r["layer2_0"]["conv1"]["kernel"] == "weight"
    assert r["layer2_0"]["bn2"]["running_var"] == "frozen"  # FrozenBN buffer
    assert r["layer2_0"]["gn_mod"]["gn"]["bias"] == "bias"  # GN trainable
    assert labels["backbone"]["fpn"]["p6"]["bias"] == "bias"
    assert labels["head"]["cls_tower"]["conv0"]["kernel"] == "weight"
    assert labels["head"]["cls_tower"]["gn0"]["gn"]["bias"] == "bias"


def test_sgd_matches_torch_semantics():
    """One step of our optax stack vs hand-computed torch SGD+momentum+wd."""
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.WEIGHT_DECAY = 0.01
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0
    params = {"m": {"kernel": jnp.asarray([2.0]), "bias": jnp.asarray([1.0])}}
    tx, labels = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    grads = {"m": {"kernel": jnp.asarray([0.5]), "bias": jnp.asarray([0.3])}}

    # torch step 1: v = g + wd*p ; p -= lr*v
    v_k = 0.5 + 0.01 * 2.0
    expect_k = 2.0 - 0.1 * v_k
    # bias: lr*2, wd 0
    v_b = 0.3
    expect_b = 1.0 - 0.2 * v_b

    updates, opt_state = tx.update(grads, opt_state, params)
    import optax

    new_params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(float(new_params["m"]["kernel"][0]), expect_k,
                               rtol=1e-6)
    np.testing.assert_allclose(float(new_params["m"]["bias"][0]), expect_b,
                               rtol=1e-6)

    # step 2 checks the momentum trace: v2 = mu*v1 + g + wd*p1
    grads2 = grads
    v_k2 = 0.9 * v_k + 0.5 + 0.01 * expect_k
    expect_k2 = expect_k - 0.1 * v_k2
    updates2, _ = tx.update(grads2, opt_state, new_params)
    new_params2 = optax.apply_updates(new_params, updates2)
    np.testing.assert_allclose(float(new_params2["m"]["kernel"][0]),
                               expect_k2, rtol=1e-6)


@pytest.mark.slow
def test_dryrun_multichip_8cpu():
    """Run the driver's multichip dryrun exactly as the driver does —
    a fresh subprocess. (In-process after the ~290 preceding tests the
    XLA CPU runtime can abort on this, the suite's biggest program;
    isolation also validates the real standalone invocation.)"""
    import os
    import subprocess
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # dryrun forces the cpu mesh itself
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "__graft_entry__.py")],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert "dryrun_multichip ok" in r.stdout


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out["cls_logits"].ndim == 3
