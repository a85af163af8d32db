"""Tensor-parallel state placement over the mesh 'model' axis.

The reference scales only by data parallelism (NCCL DDP,
`/root/reference/main.py:100-104`); on TPU the same `Mesh(('data','model'))`
also carries tensor parallelism the GSPMD way (the scaling-book recipe):
annotate the PARAMETER shardings and let XLA propagate them through the
computation and insert the collectives (all-gathers / reduce-scatters over
ICI) — no hand-written layer splits.

Policy (`training.model_parallel: N` in the config, default 1 = pure DP):
every weight matrix/kernel whose last (output-feature) dimension divides N
is sharded over 'model' on that dimension — conv kernels [H,W,I,O] on O,
dense kernels [I,O] on O; everything else (biases, norm scales, counters,
latent stats, small embeddings) stays replicated. Optimizer moments, EMA
and gradient-accumulation buffers follow their parameter's sharding because
the same rule is applied leaf-wise to the whole TrainState (moments share
the parameter shapes).

Correctness does not depend on the choice — GSPMD reshards as needed — so
the rule is deliberately simple; it exists to keep the big conv weights and
their optimizer moments distributed (param memory / N per chip) and to give
XLA the layout from which the standard TP collective pattern falls out.
Numerical equality with the replicated path is asserted on an 8-virtual-
device mesh in tests/test_sharding.py.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bbdm_tpu.parallel.mesh import replicate


def leaf_spec(leaf, model_size: int) -> P:
    """PartitionSpec for one state leaf under model-parallel width N."""
    ndim = getattr(leaf, "ndim", None)
    shape = getattr(leaf, "shape", None)
    if not ndim or not shape:  # scalars / None / non-arrays
        return P()
    if ndim >= 2 and shape[-1] % model_size == 0 and shape[-1] >= model_size:
        return P(*([None] * (ndim - 1) + ["model"]))
    return P()


def place_state(mesh: Mesh, tree, model_parallel: int = 1):
    """Place a TrainState pytree on the mesh: replicated for pure DP, or with
    weight/moment leaves sharded over 'model' when model_parallel > 1."""
    if model_parallel <= 1:
        return replicate(mesh, tree)
    if len({d.process_index for d in mesh.devices.flat}) > 1:
        # device_get/device_put of model-sharded values is not addressable
        # across processes; multi-host TP would need allgather plumbing in
        # the sampling/checkpoint paths — out of scope (the reference model
        # fits one chip; TP exists for bigger-than-chip variants)
        raise NotImplementedError(
            "model_parallel > 1 on a multi-host mesh is not supported; "
            "use tensor parallelism within one host (up to "
            f"{jax.local_device_count()} local devices) and data "
            "parallelism across hosts")

    # one tree-level device_put (not per-leaf): through the axon tunnel each
    # dispatch costs ~1ms and a full TrainState has hundreds of leaves
    shardings = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, leaf_spec(x, model_parallel)), tree)
    return jax.device_put(tree, shardings)
