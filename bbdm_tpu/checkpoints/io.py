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

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(tree, path: str) -> None:
    data = serialization.msgpack_serialize(_to_host(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_like(template, loaded):
    """Coerce a loaded (dict-of-numpy) tree onto the structure/dtypes of
    ``template`` (e.g. a TrainState field), preserving shardings at use site."""
    return serialization.from_state_dict(template, loaded)
