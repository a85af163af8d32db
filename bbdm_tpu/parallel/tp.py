"""Tensor-parallel / FSDP state placement over the mesh axes.

The reference scales only by data parallelism (NCCL DDP,
`/root/reference/main.py:100-104`); on TPU the same `Mesh(('data','model'))`
also carries tensor parallelism and fully-sharded data parallelism the GSPMD
way (the scaling-book recipe): annotate the PARAMETER shardings and let XLA
propagate them through the computation and insert the collectives
(all-gathers / reduce-scatters over ICI) — no hand-written layer splits.

Tensor parallelism (`training.model_parallel: N`, default 1 = pure DP):
every weight matrix/kernel whose last (output-feature) dimension divides N
is sharded over 'model' on that dimension — conv kernels [H,W,I,O] on O,
dense kernels [I,O] on O; everything else (biases, norm scales, counters,
latent stats, small embeddings) stays replicated.

FSDP (`training.fsdp: true`): every state leaf is additionally sharded over
the 'data' axis on its LARGEST remaining divisible dimension (conv kernels
on I when 'model' holds O, biases on their only dimension, …) — the
ZeRO-3 layout: per-chip param+moment+EMA memory drops by ~the data-axis
width, and GSPMD turns the DP gradient all-reduce into reduce-scatter +
per-layer all-gathers of the param shards on use. Leaves with no divisible
dimension stay replicated.

Optimizer moments, EMA and gradient-accumulation buffers follow their
parameter's sharding because the same rule is applied leaf-wise to the whole
TrainState (moments share the parameter shapes).

Correctness does not depend on the choice — GSPMD reshards as needed — so
the rule is deliberately simple; it exists to keep the big conv weights and
their optimizer moments distributed and to give XLA the layout from which
the standard TP/FSDP collective patterns fall out. Numerical equality with
the replicated path is asserted on an 8-virtual-device mesh in
tests/test_sharding.py.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bbdm_tpu.parallel.mesh import replicate


def leaf_spec(leaf, model_size: int, fsdp_size: int = 1) -> P:
    """PartitionSpec for one state leaf under model-parallel width N and
    (optionally) FSDP over the 'data' axis of width fsdp_size."""
    ndim = getattr(leaf, "ndim", None)
    shape = getattr(leaf, "shape", None)
    if not ndim or not shape:  # scalars / None / non-arrays
        return P()
    axes = [None] * ndim
    if (model_size > 1 and ndim >= 2
            and shape[-1] % model_size == 0 and shape[-1] >= model_size):
        axes[-1] = "model"
    if fsdp_size > 1:
        candidates = [
            d for d in range(ndim)
            if axes[d] is None and shape[d] % fsdp_size == 0 and shape[d] >= fsdp_size
        ]
        if candidates:
            # largest dim first, earliest on ties — keeps the big conv
            # input/output-feature dims distributed, not the 3x3 spatial taps
            axes[max(candidates, key=lambda d: shape[d])] = "data"
    if not any(axes):
        return P()
    return P(*axes)


def place_state(mesh: Mesh, tree, model_parallel: int = 1, fsdp: bool = False):
    """Place a TrainState pytree on the mesh: replicated for pure DP, with
    weight/moment leaves sharded over 'model' when model_parallel > 1, and/or
    over 'data' (ZeRO-3 layout) when fsdp is set."""
    fsdp_size = mesh.shape.get("data", 1) if fsdp else 1
    if model_parallel <= 1 and fsdp_size <= 1:
        return replicate(mesh, tree)

    # one tree-level device_put (not per-leaf): through the axon tunnel each
    # dispatch costs ~1ms and a full TrainState has hundreds of leaves
    shardings = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, leaf_spec(x, model_parallel, fsdp_size)),
        tree)
    return jax.device_put(tree, shardings)


@functools.lru_cache(maxsize=None)
def _replicator(mesh: Mesh):
    # identity jit with replicated out_shardings: GSPMD inserts the
    # all-gathers over ICI/DCN. Cached per mesh so repeated fetches (ckpt
    # cadence, sampling cadence) reuse the compiled gather.
    return jax.jit(lambda xs: xs, out_shardings=NamedSharding(mesh, P()))


def fetch_tree(tree):
    """``jax.device_get`` that also handles leaves sharded ACROSS processes
    (multi-host TP/FSDP state from :func:`place_state`).

    Leaves whose shards are all locally addressable (single-host, or
    replicated over the cross-host axis) fetch directly; cross-process
    sharded leaves are first all-gathered onto every process by a jitted
    identity with replicated output sharding. When any leaf needs the
    gather this is a COLLECTIVE: every process in the mesh must call
    fetch_tree on the same tree in the same order (the checkpoint/sampling
    call sites in runners/base.py are structured to guarantee this).

    Note the gather materializes the full value on every device and then on
    the host — fine for anything one intends to write into a single
    checkpoint file or sample from on one host, by construction.
    """
    flat, treedef = jax.tree_util.tree_flatten(tree)
    gather_idx = [
        i for i, x in enumerate(flat)
        if isinstance(x, jax.Array)
        and not x.is_fully_addressable and not x.is_fully_replicated
    ]
    if gather_idx:
        mesh = flat[gather_idx[0]].sharding.mesh
        gathered = _replicator(mesh)([flat[i] for i in gather_idx])
        for i, g in zip(gather_idx, gathered):
            flat[i] = g
    return jax.device_get(jax.tree_util.tree_unflatten(treedef, flat))
