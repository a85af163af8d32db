"""The functional train state: one pytree replacing the reference's mutable
net/optimizer/EMA/counter soup (SURVEY.md §7 decision 1).

``step`` counts microbatches exactly like the reference's ``global_step``
(`runners/BaseRunner.py:399`); the optimizer applies every
``accumulate_grad_batches`` microbatches with the *summed* gradient, matching
torch's ``loss.backward()`` accumulation semantics (`:412-417` — the reference
does not divide by the accumulation count).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from bbdm_tpu.training.plateau import PlateauState


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # i32, microbatch counter (== reference global_step)
    params: Any
    ema_params: Any
    opt_state: Any
    plateau: PlateauState
    grad_accum: Optional[Any] = None  # present iff accumulate_grad_batches > 1
    latent_stats: Optional[Any] = None  # LBBDM normalize_latent stats
    model_state: Optional[Any] = None  # mutable collections (e.g. GAN batch_stats)


def zeros_like_tree(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)
