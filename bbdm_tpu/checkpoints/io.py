"""Checkpoint serialization.

Content contract mirrors the reference (`runners/BaseRunner.py:140-170`,
`BBDMRunner.py:70-83`):

  model ckpt:  {'model': params, 'ema': ema_params, 'step': int, 'epoch': int
                [, 'ori_latent_mean'/'ori_latent_std'/
                   'cond_latent_mean'/'cond_latent_std']}
  optim ckpt:  {'optimizer': [opt_state], 'scheduler': [plateau_state]}
               (lists — multi-optimizer GAN-ready, like the reference)

Files use flax msgpack serialization with a ``.ckpt`` extension and the same
naming scheme (`latest_model_{epoch}.ckpt`, `last_model.ckpt`,
`top_model_epoch_{e}.ckpt`). Writes are atomic (tmp + rename) so an
interrupted save never corrupts the previous checkpoint.
"""

from __future__ import annotations

import os
import threading

import jax
import numpy as np
from flax import serialization

# ONE background writer thread, FIFO: submission order gives same-path
# ordering for free, and at most one multi-GB msgpack blob exists at a time
# (thread-per-save would serialize the latest/last/top pairs concurrently —
# several extra GB of transient host memory on a big model)
_executor = None
_futures: dict[str, object] = {}  # path -> last submitted Future
_lock = threading.Lock()


def _get_executor():
    global _executor
    if _executor is None:
        from concurrent.futures import ThreadPoolExecutor

        _executor = ThreadPoolExecutor(1, thread_name_prefix="ckpt-write")
    return _executor


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(tree, path: str, *, background: bool = False) -> None:
    """Serialize ``tree`` to ``path`` (atomic tmp+rename).

    ``background=True`` moves the msgpack serialization and disk write to
    the single FIFO writer thread so the training loop only pays the
    device→host fetch (which must stay synchronous: the step donates the
    state buffers, so they may be overwritten as soon as the next step
    dispatches). A writer failure (e.g. ENOSPC) is re-raised at the next
    same-path save or at ``wait_for_saves()`` — never swallowed.
    """
    host_tree = _to_host(tree)  # synchronous device fetch (see docstring)

    def write():
        data = serialization.msgpack_serialize(host_tree)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    with _lock:
        prev = _futures.pop(path, None)
    if prev is not None:
        prev.result()  # same-path ordering; re-raises a failed earlier write
    if not background:
        write()
        return
    fut = _get_executor().submit(write)
    with _lock:
        _futures[path] = fut


def wait_for_saves() -> None:
    """Drain every pending background checkpoint write, re-raising the first
    failure AFTER all writers have finished (call before process exit,
    before deleting checkpoint files, and before reading back a just-saved
    checkpoint). All futures are joined even when an early one raises —
    abandoning in-flight writers would let a caller that catches the error
    delete/read files still being written."""
    with _lock:
        pending = list(_futures.values())
        _futures.clear()
    first_err = None
    for f in pending:
        try:
            f.result()
        except BaseException as e:
            if first_err is None:
                first_err = e
    if first_err is not None:
        raise first_err


def wait_for_path(path: str) -> None:
    """Join only the pending writer (if any) for one target path —
    re-raises its failure. Cheaper than wait_for_saves() when a caller only
    needs a specific file settled (e.g. before deleting it)."""
    with _lock:
        fut = _futures.pop(path, None)
    if fut is not None:
        fut.result()


def load_checkpoint(path: str):
    wait_for_saves()  # a just-dispatched background save must land first
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_like(template, loaded):
    """Coerce a loaded (dict-of-numpy) tree onto the structure/dtypes of
    ``template`` (e.g. a TrainState field), preserving shardings at use site."""
    return serialization.from_state_dict(template, loaded)


def extract_vqgan_tree(tree):
    """The VQGAN param tree from any of our checkpoint layouts: a bare tree,
    a converted ``{'vqgan': ...}`` ckpt, or a full VQGANRunner training
    checkpoint (``{'model': {'vqgan': ...}, ...}``). Shared by the LBBDM
    frozen-first-stage load and scripts/eval_vqgan_recon.py."""
    if "vqgan" in tree:
        return tree["vqgan"]
    if "model" in tree and "vqgan" in tree["model"]:
        return tree["model"]["vqgan"]
    return tree
