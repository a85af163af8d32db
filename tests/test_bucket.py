"""Small-leaf optimizer bucketing (training/bucket.py): semantics must be
IDENTICAL to the per-leaf path — same accumulator, same Adam trajectory —
only the kernel count changes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

from bbdm_tpu.models import build_model
from bbdm_tpu.training import TrainState, make_train_step
from bbdm_tpu.training.bucket import SmallLeafBucketer
from bbdm_tpu.training.ema import ema_init
from bbdm_tpu.training.optim import build_optimizer
from bbdm_tpu.training.plateau import plateau_init
from bbdm_tpu.training.state import zeros_like_tree
from tests.conftest import tiny_bbdm_config
from tests.test_latent import lbbdm_config


def test_bucket_roundtrip_identity():
    cfg = lbbdm_config("SpatialRescaler")
    m = build_model(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    b = SmallLeafBucketer(params, m.trainable_mask(params), threshold=4096)
    back = b.unbucket(b.bucket(params))
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_frozen_leaves_stay_out_of_bucket():
    cfg = lbbdm_config("SpatialRescaler")
    m = build_model(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    mask = m.trainable_mask(params)
    b = SmallLeafBucketer(params, mask, threshold=10**9)  # everything "small"
    leaves = jax.tree_util.tree_leaves_with_path(params)
    frozen = {i for i, (path, _) in enumerate(leaves)
              if "vqgan" in jax.tree_util.keystr(path)}
    assert frozen, "no frozen leaves found"
    assert frozen.isdisjoint(set(b.small_idx))
    bm = b.bucket_mask(mask)
    assert bm["bucket"] is True
    assert not any(bm["big"][str(i)] for i in frozen)


def test_bucketed_optimizer_scripted_trajectory():
    """Over SCRIPTED gradients (no network feedback, so no chaotic
    amplification through Adam's near-zero normalization) the bucketed and
    per-leaf Adam trajectories must agree to fp precision for 20 steps."""
    cfg = tiny_bbdm_config(BB={"params": {"num_timesteps": 20}})
    m = build_model(cfg, dtype=jnp.float32)
    params0 = m.init_params(jax.random.PRNGKey(0))
    mask = m.trainable_mask(params0)
    b = SmallLeafBucketer(params0, mask, threshold=65536)
    assert len(b.small_idx) > 10  # the fusion target actually exists

    leaves, treedef = jax.tree_util.tree_flatten(params0)

    def grad_script(step):
        rs = np.random.RandomState(500 + step)
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(rs.randn(*l.shape).astype(np.float32) * 0.1)
                      for l in leaves])

    def run(bucketer):
        tx = build_optimizer(
            cfg.BB.optimizer,
            bucketer.bucket_mask(mask) if bucketer else mask)
        params = params0
        opt_state = tx.init(bucketer.bucket(params) if bucketer else params)

        @jax.jit
        def step_fn(params, opt_state, grads):
            if bucketer is not None:
                grads = bucketer.bucket(grads)
            updates, opt_state = tx.update(
                grads, opt_state,
                bucketer.bucket(params) if bucketer else params)
            updates = jax.tree_util.tree_map(lambda u: -1e-3 * u, updates)
            if bucketer is not None:
                updates = bucketer.unbucket(updates)
            import optax

            return optax.apply_updates(params, updates), opt_state

        for i in range(20):
            params, opt_state = step_fn(params, opt_state, grad_script(i))
        return params

    ref, got = run(None), run(b)
    for (pa, la), (_, lb) in zip(
            jax.tree_util.tree_leaves_with_path(ref),
            jax.tree_util.tree_leaves_with_path(got)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-6, atol=1e-7,
            err_msg=f"scripted trajectory diverged at {jax.tree_util.keystr(pa)}")


@pytest.mark.parametrize("accumulate", [1, 2])
def test_bucketed_train_step_one_cycle(accumulate):
    """One full accumulation cycle through the real train step (network in
    the loop): bucketed and per-leaf params/EMA agree. One cycle keeps the
    comparison below Adam's chaotic-amplification horizon — the backward
    pass compiles differently with the bucket concat in the graph, and
    those ~1e-9 fusion-order differences blow up over many steps."""
    cfg = tiny_bbdm_config(BB={"params": {"num_timesteps": 20}})
    from bbdm_tpu.config import dict2namespace

    training = dict2namespace({"accumulate_grad_batches": accumulate})
    ema_cfg = dict2namespace({"use_ema": True, "ema_decay": 0.9,
                              "update_ema_interval": 1, "start_ema_step": 0})
    m = build_model(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    mask = m.trainable_mask(params)

    def run(bucketer):
        tx = build_optimizer(
            cfg.BB.optimizer,
            bucketer.bucket_mask(mask) if bucketer else mask)
        opt_params = bucketer.bucket(params) if bucketer else params
        step_fn = jax.jit(make_train_step(
            m, tx, training, ema_config=ema_cfg,
            lr_scheduler_config=cfg.BB.lr_scheduler, bucketer=bucketer))
        state = TrainState(
            step=jnp.asarray(0, jnp.int32), params=params,
            ema_params=ema_init(params), opt_state=tx.init(opt_params),
            plateau=plateau_init(cfg.BB.optimizer.lr),
            grad_accum=zeros_like_tree(opt_params) if accumulate > 1 else None,
        )
        rs = np.random.RandomState(3)
        for i in range(accumulate):
            x = jnp.asarray(rs.rand(2, 8, 8, 3).astype(np.float32))
            y = jnp.asarray(rs.rand(2, 8, 8, 3).astype(np.float32))
            state, _ = step_fn(state, x, y, jax.random.PRNGKey(100 + i))
        return state

    ref = run(None)
    got = run(SmallLeafBucketer(params, mask, threshold=65536))
    for (pa, la), (_, lb) in zip(
            jax.tree_util.tree_leaves_with_path(ref.params),
            jax.tree_util.tree_leaves_with_path(got.params)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-5, atol=5e-8,
            err_msg=f"param cycle diverged at {jax.tree_util.keystr(pa)}")
    for la, lb in zip(jax.tree_util.tree_leaves(ref.ema_params),
                      jax.tree_util.tree_leaves(got.ema_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=5e-8)
