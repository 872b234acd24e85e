"""Worker process for the true 2-process jax.distributed test.

Launched by tests/test_distributed_2proc.py as

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    JAX_COORDINATOR_ADDRESS=localhost:<port> JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=<0|1> PAA_DIST_OUT=<pickle path> \
    python tests/distributed_worker.py

i.e. the exact shape of the reference's one-process-per-GPU NCCL launch
(python -m torch.distributed.launch --nproc_per_node=2 tools/train_net.py,
tools/train_net.py:150-155), with jax's coordination service + Gloo CPU
collectives standing in for NCCL. Each process owns 4 virtual CPU
devices; together they form the 8-device global 'data' mesh.

What runs for real here (previously only simulated single-process by
tests/test_multihost.py):
  * comm.initialize_multihost()        -- the framework's own bootstrap
  * jax.make_array_from_process_local_data -- trainer.py:106's global
    batch assembly from per-process loader slices
  * one PAA train step jitted over the global 2-process mesh
  * a sharded eval on each process's local mesh
  * comm.all_gather_pickled            -- the reference's padded
    ByteTensor all_gather of eval predictions (utils/comm.py:48-88)

Process 0 pickles {metrics, updated-param digests, gathered eval} to
PAA_DIST_OUT; the pytest side compares against the identical program run
single-process.
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    import jax

    from paa_tpu.utils import comm

    comm.initialize_multihost()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from paa_tpu.engine import TrainState, jit_train_step
    from test_shard_invariance import HW, _batch, _setup

    cfg, model, params, tx, labels, anchors, counts = _setup()
    variables = {"params": params}
    batch = _batch(8)
    batch_np = {k: np.asarray(v) for k, v in batch.items()}

    mesh = Mesh(np.array(jax.devices()), ("data",))
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    # --- global-batch assembly exactly as engine/trainer.py:102-110 ----
    # this process's rows of the global batch (the loader would have
    # loaded exactly these; here both processes hold the full
    # deterministic batch and slice it)
    rows = sorted(
        int(idx[0].start)
        for idx in batch_sh.addressable_devices_indices_map(
            batch_np["images"].shape
        ).values()
    )
    device_batch = {
        k: jax.make_array_from_process_local_data(batch_sh, v[rows])
        for k, v in batch_np.items()
    }

    # --- one train step over the global 2-process mesh -----------------
    params_c = jax.tree_util.tree_map(jnp.array, params)
    state = TrainState.create(model.module.apply, params_c, tx)
    state = jax.device_put(state, repl)
    step_fn = model.make_bucket_train_step(
        HW, param_label_tree=labels, num_shards=8
    )
    step = jit_train_step(step_fn, mesh)
    new_state, metrics = step(state, device_batch)
    metrics = {k: float(v) for k, v in metrics.items()}

    # f64 digests of every updated parameter (fully-replicated arrays
    # are addressable on every process)
    digests = {
        jax.tree_util.keystr(kp): [
            float(np.sum(np.asarray(v, np.float64))),
            float(np.sum(np.abs(np.asarray(v, np.float64)))),
        ]
        for kp, v in jax.tree_util.tree_leaves_with_path(new_state.params)
    }

    # --- sharded eval on the local mesh + pickled all_gather ------------
    # each process evaluates its own slice on its own 4 devices
    # (engine/inference.py's per-process sharding), then predictions are
    # gathered exactly like the reference's
    # _accumulate_predictions_from_multiple_gpus
    local_mesh = comm.local_data_mesh()
    eval_fn = model.make_eval_fn(variables, mesh=local_mesh)
    images = jnp.asarray(batch_np["images"][rows])
    sizes = jnp.asarray(
        np.tile(np.array([[HW[0], HW[1]]], np.float32), (len(rows), 1))
    )
    out = eval_fn(images, sizes)
    local_eval = {
        "rows": rows,
        **{k: np.asarray(v) for k, v in out.items()},
    }
    gathered = comm.all_gather_pickled(local_eval)
    assert len(gathered) == 2

    if comm.is_main_process():
        order = np.argsort(
            np.concatenate([g["rows"] for g in gathered])
        )
        eval_global = {
            k: np.concatenate([g[k] for g in gathered])[order]
            for k in out
        }
        with open(os.environ["PAA_DIST_OUT"], "wb") as f:
            pickle.dump(
                {
                    "metrics": metrics,
                    "digests": digests,
                    "eval": eval_global,
                    "rows_per_process": [g["rows"] for g in gathered],
                },
                f,
            )
    # let process 0 finish writing before the runtime tears down
    comm.all_gather_pickled("done")
    print(f"worker {jax.process_index()} OK", flush=True)


if __name__ == "__main__":
    main()
