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

# one pending writer per target path: joining the previous writer before
# starting the next keeps same-path saves ordered (last dispatched wins)
_writers: dict[str, threading.Thread] = {}
_writers_lock = threading.Lock()


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(tree, path: str, *, background: bool = False) -> None:
    """Serialize ``tree`` to ``path`` (atomic tmp+rename).

    ``background=True`` moves the msgpack serialization and disk write to a
    writer thread so the training loop only pays the device→host fetch
    (which must stay synchronous: the step donates the state buffers, so
    they may be overwritten as soon as the next step dispatches). Writers
    are ordered per path; ``wait_for_saves()`` joins them all.
    """
    host_tree = _to_host(tree)  # synchronous device fetch (see docstring)

    def write():
        data = serialization.msgpack_serialize(host_tree)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    with _writers_lock:
        prev = _writers.pop(path, None)
    if prev is not None:
        prev.join()  # same-path ordering (also for a sync save over a bg one)
    if not background:
        write()
        return
    t = threading.Thread(target=write, name=f"ckpt-write:{os.path.basename(path)}")
    with _writers_lock:
        _writers[path] = t
    t.start()


def wait_for_saves() -> None:
    """Join every pending background checkpoint writer (call before process
    exit and before reading back a just-saved checkpoint)."""
    with _writers_lock:
        pending = list(_writers.values())
        _writers.clear()
    for t in pending:
        t.join()


def load_checkpoint(path: str):
    wait_for_saves()  # a just-dispatched background save must land first
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_like(template, loaded):
    """Coerce a loaded (dict-of-numpy) tree onto the structure/dtypes of
    ``template`` (e.g. a TrainState field), preserving shardings at use site."""
    return serialization.from_state_dict(template, loaded)
