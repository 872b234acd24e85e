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


def get_world_size():
    return jax.device_count()


def get_rank():
    return jax.process_index()


def is_main_process():
    return jax.process_index() == 0
