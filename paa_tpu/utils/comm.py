"""Device-mesh helpers.

Replaces the reference's torch.distributed/NCCL plumbing
(paa_core/utils/comm.py, tools/train_net.py:150-155): on TPU there is no
process-group bootstrap — a jax.sharding.Mesh over the data axis plus
sharding annotations make XLA insert the collectives over ICI. The
reference's ``reduce_sum`` of positive counts / IoU sums becomes a plain
``jnp.sum`` inside the globally-sharded jitted program; ``all_gather`` of
eval predictions becomes ``jax.device_get`` of globally-addressable
outputs.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_data_mesh(num_devices=-1):
    """1-D mesh over the 'data' axis (the reference's only parallelism)."""
    devices = jax.devices()
    if num_devices in (-1, 0, None):
        num_devices = len(devices)
    return Mesh(np.array(devices[:num_devices]), ("data",))


def batch_sharding(mesh):
    """Shard leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def local_data_mesh():
    """Mesh over THIS PROCESS's devices, for eval sharding (each process
    evaluates its own round-robin share of batches on its own chips)."""
    devices = jax.local_devices()
    return Mesh(np.array(devices), ("data",))


def shard_eval_fn(body, variables, mesh=None):
    """jit ``body(variables, images, image_sizes)`` over the mesh's data
    axis via shard_map, replicating the params.

    shard_map (not pjit sharding annotations) because the inference path
    ends in a Pallas kernel (batched NMS), and custom calls have no SPMD
    partitioning rule — under shard_map each shard runs the kernel on
    its own batch slice. ``mesh=None`` or a 1-device mesh falls back to
    plain jit (NamedSharding-annotated programs dispatch ~100x slower on
    1-device meshes on the axon platform — see bench.py).
    """
    if mesh is None or mesh.devices.size == 1:
        return jax.jit(
            lambda images, sizes: body(variables, images, sizes)
        )
    pvars = jax.tree.map(lambda _: P(), variables)
    sm = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(pvars, P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    return jax.jit(lambda images, sizes: sm(variables, images, sizes))


def get_world_size():
    return jax.device_count()


def get_rank():
    return jax.process_index()


def is_main_process():
    return jax.process_index() == 0


def all_gather_pickled(obj):
    """Gather arbitrary picklable objects from every process (the
    reference's padded-ByteTensor all_gather, paa_core/utils/comm.py:48-88,
    rebuilt on jax.experimental.multihost_utils). Returns a list with one
    entry per process; single-process returns [obj] without touching the
    device.
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    local_size = np.asarray([data.size], dtype=np.int64)
    sizes = np.asarray(
        multihost_utils.process_allgather(local_size)
    ).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), dtype=np.uint8)
    padded[: data.size] = data
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(jax.process_count())
    ]


def initialize_multihost(logger=None):
    """Multi-host bootstrap: call jax.distributed.initialize when a
    coordinator is configured via env (JAX_COORDINATOR_ADDRESS /
    standard TPU pod metadata). Safe no-op on a single host.

    This is the reference's process-group bootstrap
    (torch.distributed.init_process_group("nccl", init_method="env://"),
    tools/train_net.py:150-155) rebuilt on jax's coordination service:
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID play
    the role of MASTER_ADDR / WORLD_SIZE / RANK. On TPU pods the
    runtime detects the topology itself and the explicit env vars are
    unnecessary. Executed for real (2 processes x 4 CPU devices) by
    tests/test_distributed_2proc.py.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        # single host, or a TPU pod where the runtime bootstraps the
        # coordination service itself. NOTE: do not probe
        # jax.process_count() before this check — it initializes the
        # XLA backend, after which jax.distributed.initialize refuses
        # to run.
        return
    # already initialized (e.g. called twice)? Prefer the public API;
    # fall back to probing the private client attr on older jax.
    try:
        if jax.distributed.is_initialized():
            return
    except AttributeError:
        try:
            from jax._src import distributed as _dist

            if getattr(_dist.global_state, "client", None) is not None:
                return
        except Exception:
            pass
    kwargs = {"coordinator_address": addr}
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if nproc is not None:
        pid = os.environ.get("JAX_PROCESS_ID")
        if pid is None:
            raise RuntimeError(
                "JAX_NUM_PROCESSES is set but JAX_PROCESS_ID is not: "
                "multi-process launches must set both (they play the "
                "role of torch.distributed's WORLD_SIZE / RANK, with "
                "JAX_COORDINATOR_ADDRESS as MASTER_ADDR)."
            )
        kwargs["num_processes"] = int(nproc)
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    if logger:
        logger.info(
            f"jax.distributed initialized: process "
            f"{jax.process_index()}/{jax.process_count()}"
        )
