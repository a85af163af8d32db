"""Data-parallel mesh over TPU devices.

The TPU-native replacement for the reference's NCCL DDP stack
(`main.py:68-104`, SURVEY.md §2.3): a `jax.sharding.Mesh` with axes
('data', 'model'); batches are sharded over 'data', params/state replicated.
Under jit, the global batch-mean loss makes XLA insert the gradient
all-reduce over ICI — no hand-written collectives or process groups.

The 'model' axis is reserved for tensor-parallel sharding of the UNet
(size 1 by default — the ~240M-param model fits one chip, SURVEY.md §2.3).
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
    """Put array leaves of a batch dict on the mesh, sharded over 'data'."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/state) across every mesh device."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
