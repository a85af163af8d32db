"""Data-parallel mesh over TPU devices.

The TPU-native replacement for the reference's NCCL DDP stack
(`main.py:68-104`, SURVEY.md §2.3): a `jax.sharding.Mesh` with axes
('data', 'model'); batches are sharded over 'data', params/state replicated.
Under jit, the global batch-mean loss makes XLA insert the gradient
all-reduce over ICI — no hand-written collectives or process groups.

The 'model' axis carries tensor parallelism when `training.model_parallel`
is set (parallel/tp.py: weight/moment/EMA leaves sharded over 'model',
GSPMD inserts the TP collectives); size 1 by default — the ~240M-param
model fits one chip (SURVEY.md §2.3), TP exists for bigger-than-chip
variants and memory headroom.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Put array leaves of a batch dict on the mesh, sharded over 'data'.

    Multi-host: each process passes its OWN loader shard (the DataLoader
    already splits the dataset per process, DistributedSampler-style), and
    the global batch is assembled from the per-process pieces with
    `jax.make_array_from_process_local_data` — global batch size is
    process_count * per-host batch_size, matching the reference's DDP
    semantics where `data.train.batch_size` is per-rank
    (`/root/reference/runners/BaseRunner.py:345-363`). A plain device_put
    of host-local data would instead be interpreted as the full global
    value, silently dropping every other host's samples.
    """
    sharding = NamedSharding(mesh, P("data"))
    # decide by the MESH, not jax.process_count(): a host-local mesh (e.g.
    # the per-host sampling mesh in a multi-host run) must take the plain
    # device_put path — make_array_from_process_local_data is a collective
    # over every process in the mesh and would deadlock when called by one
    multihost = len({d.process_index for d in mesh.devices.flat}) > 1

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            if multihost:
                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x))
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/state) across every mesh device."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
