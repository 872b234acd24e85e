"""True 2-process jax.distributed execution (VERDICT r3 item 5).

Spawns two real OS processes, each with 4 virtual CPU devices, that
bootstrap through comm.initialize_multihost (the reference's
init_process_group("nccl", init_method="env://") analogue,
tools/train_net.py:150-155), assemble a global batch with
jax.make_array_from_process_local_data, run one PAA train step over the
8-device 2-process mesh, run a sharded eval per process, and gather
predictions with comm.all_gather_pickled — then asserts the result
equals the identical program run single-process in this interpreter.

This closes the gap that tests/test_multihost.py only *simulated*
process ranks: here the collectives really cross a process boundary
(Gloo over the coordination service).
"""

import os
import pickle
import socket
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from paa_tpu.engine import TrainState, jit_train_step

from test_shard_invariance import HW, _batch, _setup

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid, port, out_path):
    env = dict(os.environ)
    # zero out the axon TPU hookup: the workers are CPU-only and must
    # not race this process for the single tunneled chip
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    env["JAX_NUM_PROCESSES"] = "2"
    env["JAX_PROCESS_ID"] = str(pid)
    env["PAA_DIST_OUT"] = out_path
    env["PYTHONPATH"] = REPO
    # share the persistent compile cache with the test session
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/paa_tpu_jax_cache")
    return subprocess.Popen(
        [sys.executable, WORKER],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        cwd=REPO,
    )


def test_two_process_train_step_and_eval_match_single_process(tmp_path):
    out_path = str(tmp_path / "dist_out.pkl")
    port = _free_port()
    procs = [_spawn(pid, port, out_path) for pid in (0, 1)]
    # Poll both workers against a shared deadline: if one crashes while
    # the other blocks in a collective, kill the survivor immediately
    # instead of waiting out the full timeout, and always drain stdout
    # so the failure message carries both logs.
    deadline = time.time() + 1200
    failure = None
    while any(p.poll() is None for p in procs):
        if any(p.poll() not in (None, 0) for p in procs):
            failure = "a worker exited non-zero"
            break
        if time.time() > deadline:
            failure = "distributed workers timed out"
            break
        time.sleep(0.5)
    for p in procs:
        if p.poll() is None:
            p.kill()
    logs = [p.communicate()[0] or "" for p in procs]
    if failure is not None:
        pytest.fail(
            failure
            + "".join(
                f"\n--- worker {i} (rc={p.returncode}) ---\n{log[-4000:]}"
                for i, (p, log) in enumerate(zip(procs, logs))
            )
        )
    for p, log in zip(procs, logs):
        assert p.returncode == 0, (
            f"worker exited {p.returncode}:\n{log[-4000:]}"
        )
    with open(out_path, "rb") as f:
        dist = pickle.load(f)

    # processes must have partitioned the batch, not duplicated it
    r0, r1 = dist["rows_per_process"]
    assert sorted(r0 + r1) == list(range(8))
    assert set(r0).isdisjoint(r1)

    # ---- single-process reference: identical program on this
    # interpreter's 8 virtual devices ---------------------------------
    cfg, model, params, tx, labels, anchors, counts = _setup()
    variables = {"params": params}
    batch = _batch(8)
    params_c = jax.tree_util.tree_map(jnp.array, params)
    state = TrainState.create(model.module.apply, params_c, tx)
    step_fn = model.make_bucket_train_step(
        HW, param_label_tree=labels, num_shards=8
    )
    mesh = Mesh(np.array(jax.devices()), ("data",))
    new_state, metrics = jit_train_step(step_fn, mesh)(state, batch)

    ref_metrics = {k: float(v) for k, v in metrics.items()}
    assert dist["metrics"]["num_pos"] == ref_metrics["num_pos"]
    for k, v in ref_metrics.items():
        np.testing.assert_allclose(
            dist["metrics"][k], v, rtol=1e-4, atol=1e-6,
            err_msg=f"metric {k} differs across the process boundary",
        )

    ref_digests = {
        jax.tree_util.keystr(kp): [
            float(np.sum(np.asarray(v, np.float64))),
            float(np.sum(np.abs(np.asarray(v, np.float64)))),
        ]
        for kp, v in jax.tree_util.tree_leaves_with_path(new_state.params)
    }
    assert set(dist["digests"]) == set(ref_digests)
    for key, (s, a) in ref_digests.items():
        ds, da = dist["digests"][key]
        np.testing.assert_allclose(
            [ds, da], [s, a], rtol=1e-4, atol=1e-6,
            err_msg=f"updated param {key} differs",
        )

    # ---- eval: gathered 2-process predictions vs single jit ----------
    images = jnp.asarray(batch["images"])
    sizes = jnp.asarray(
        np.tile(np.array([[HW[0], HW[1]]], np.float32), (8, 1))
    )
    ref_eval = model.make_eval_fn(variables)(images, sizes)
    # discrete outputs exact; coords/scores to tolerance (XLA schedules
    # convs differently at different batch sizes — see test_sharded_eval)
    np.testing.assert_array_equal(
        dist["eval"]["valid"], np.asarray(ref_eval["valid"])
    )
    np.testing.assert_array_equal(
        dist["eval"]["labels"], np.asarray(ref_eval["labels"])
    )
    np.testing.assert_allclose(
        dist["eval"]["scores"], np.asarray(ref_eval["scores"]), atol=1e-4
    )
    np.testing.assert_allclose(
        dist["eval"]["boxes"], np.asarray(ref_eval["boxes"]), atol=0.05
    )
