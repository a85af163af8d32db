"""Small-leaf bucketing for the optimizer path (BENCH_NOTES round 3).

The flagship UNet has ~250 trainable leaves of which ~174 are small
(norm scales/biases, conv biases, time-embed biases — 326k elements total,
~1.3 MB) while 74 conv/dense kernels hold 99.9% of the parameters. Per-leaf
gradient-accumulation adds and Adam moment updates cost a kernel launch each
(~38-52us on v5e through the tunnel — profiled round 2 at ~15 ms/step), so
the hundreds of small leaves pay launch overhead wildly out of proportion to
their bytes.

``SmallLeafBucketer`` concatenates the small *trainable* leaves into ONE
flat vector for everything the optimizer touches (accumulator, moments,
update scaling) while the big kernels stay per-leaf — the round-2
flat-EVERYTHING experiment lost 17% because fusing the conv kernels into one
buffer cost XLA its per-conv fusion freedom; this is the middle path.

Enabled by ``training.fuse_small_leaves`` (threshold:
``training.fuse_threshold``, default 65536 elements). The optimizer state
then nests as {'bucket': ..., 'big': {leaf-index: ...}} — resuming a
checkpoint written with a different fuse setting is not supported (the
optimizer-state trees differ structurally).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


class SmallLeafBucketer:
    """Reversible tree <-> {'bucket': vec, 'big': {str(i): leaf}} transform.

    Built once from the parameter tree + trainable mask; only trainable
    leaves with size <= threshold join the bucket (frozen leaves — e.g. the
    LBBDM VQGAN — stay in 'big' where ``optax.masked`` skips them without
    allocating moment memory).
    """

    def __init__(self, params: Any, mask: Any, threshold: int = 65536):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        mask_leaves = jax.tree_util.tree_flatten(mask)[0]
        assert len(leaves) == len(mask_leaves)
        self.treedef = treedef
        self.n_leaves = len(leaves)
        self.small_idx = [
            i for i, (l, m) in enumerate(zip(leaves, mask_leaves))
            if m and l.size <= threshold
        ]
        self.big_idx = [i for i in range(len(leaves)) if i not in set(self.small_idx)]
        self.shapes = [leaves[i].shape for i in self.small_idx]
        self.sizes = [int(np.prod(s)) if s else 1 for s in self.shapes]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)]).tolist()
        self.total = self.offsets[-1]
        self.dtypes = [leaves[i].dtype for i in self.small_idx]

    # ------------------------------------------------------------- arrays

    def bucket(self, tree: Any) -> dict:
        """tree (same structure as params) -> {'bucket': [total], 'big': {...}}."""
        leaves = jax.tree_util.tree_flatten(tree)[0]
        vec = jnp.concatenate(
            [jnp.ravel(leaves[i]).astype(jnp.float32) for i in self.small_idx]
        ) if self.small_idx else jnp.zeros((0,), jnp.float32)
        big = {str(i): leaves[i] for i in self.big_idx}
        return {"bucket": vec, "big": big}

    def unbucket(self, btree: dict) -> Any:
        """Inverse of :meth:`bucket` (slices fuse into their consumers)."""
        vec, big = btree["bucket"], btree["big"]
        leaves: list = [None] * self.n_leaves
        for k, (i, shape, dt) in enumerate(
                zip(self.small_idx, self.shapes, self.dtypes)):
            leaves[i] = jax.lax.dynamic_slice_in_dim(
                vec, self.offsets[k], self.sizes[k]).reshape(shape).astype(dt)
        for i in self.big_idx:
            leaves[i] = big[str(i)]
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    # -------------------------------------------------------------- masks

    def bucket_mask(self, mask: Any) -> dict:
        """Trainable mask in bucketed structure (the bucket is all-trainable
        by construction)."""
        leaves = jax.tree_util.tree_flatten(mask)[0]
        return {"bucket": True, "big": {str(i): leaves[i] for i in self.big_idx}}
