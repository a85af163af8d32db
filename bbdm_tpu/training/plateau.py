"""ReduceLROnPlateau as a pure-JAX state transition.

Semantics match torch's ``ReduceLROnPlateau(mode='min', threshold_mode='rel')``
which the reference steps with the current training loss on every optimizer
step (`runners/DiffusionBasedModelRunners/BBDMRunner.py:59-67`,
`runners/BaseRunner.py:416-417`):

  * better  <=> metric < best * (1 - threshold)
  * in cooldown: tick the cooldown counter and suppress bad-epoch counting
  * after ``patience`` consecutive bad steps: lr <- max(lr * factor, min_lr),
    enter cooldown.

Living inside the jitted train step means LR decisions do not force a host
round-trip per step.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PlateauState:
    lr: jnp.ndarray  # f32 scalar
    best: jnp.ndarray  # f32 scalar
    num_bad: jnp.ndarray  # i32 scalar
    cooldown_count: jnp.ndarray  # i32 scalar


def plateau_init(lr: float) -> PlateauState:
    return PlateauState(
        lr=jnp.asarray(lr, jnp.float32),
        best=jnp.asarray(jnp.inf, jnp.float32),
        num_bad=jnp.asarray(0, jnp.int32),
        cooldown_count=jnp.asarray(0, jnp.int32),
    )


def plateau_step(
    state: PlateauState,
    metric: jnp.ndarray,
    *,
    factor: float,
    patience: int,
    threshold: float,
    cooldown: int,
    min_lr: float,
) -> PlateauState:
    metric = metric.astype(jnp.float32)
    is_better = metric < state.best * (1.0 - threshold)
    best = jnp.where(is_better, metric, state.best)

    in_cooldown = state.cooldown_count > 0
    num_bad = jnp.where(is_better, 0, state.num_bad + 1)
    num_bad = jnp.where(in_cooldown, 0, num_bad)
    cooldown_count = jnp.where(in_cooldown, state.cooldown_count - 1, state.cooldown_count)

    reduce_now = num_bad > patience
    lr = jnp.where(reduce_now, jnp.maximum(state.lr * factor, min_lr), state.lr)
    cooldown_count = jnp.where(reduce_now, cooldown, cooldown_count)
    num_bad = jnp.where(reduce_now, 0, num_bad)

    return PlateauState(lr=lr, best=best, num_bad=num_bad, cooldown_count=cooldown_count)
