"""Data-parallel correctness on a virtual 8-device CPU mesh (SURVEY.md §4):
one sharded train step must produce the same updated params as a single-device
step on the same global batch (the psum gradient path).

Runs in a subprocess: XLA CPU collectives can abort the process on rendezvous
timeouts when 8 fake devices share one core, and that must not kill pytest.
"""

import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

import subprocess
import sys

# shared prelude: environment pinning, tiny model/optimizer setup, and the
# single-device baseline step both subprocess scripts compare against
_PRELUDE = r"""
import os
os.environ["XLA_FLAGS"] = (
    " --xla_force_host_platform_device_count=8"
    " --xla_cpu_collective_call_terminate_timeout_seconds=600"
    " --xla_cpu_collective_timeout_seconds=600"
)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from tests.conftest import tiny_bbdm_config
from bbdm_tpu.models import build_model
from bbdm_tpu.training import TrainState, make_train_step, plateau_init
from bbdm_tpu.training.optim import build_optimizer
from bbdm_tpu.parallel import make_mesh, place_state, replicate, shard_batch
from bbdm_tpu.parallel.tp import leaf_spec
from bbdm_tpu.config import dict2namespace

cfg = tiny_bbdm_config()
cfg.training = dict2namespace({"accumulate_grad_batches": 1})
model = build_model(cfg)
params = model.init_params(jax.random.PRNGKey(0))
tx = build_optimizer(cfg.BB.optimizer, trainable_mask=model.trainable_mask(params))
step_fn = make_train_step(model, tx, cfg.training, ema_config=None,
                          lr_scheduler_config=cfg.BB.lr_scheduler)

def fresh_state():
    return TrainState(
        step=jnp.asarray(0, jnp.int32), params=params, ema_params=None,
        opt_state=tx.init(params), plateau=plateau_init(cfg.BB.optimizer.lr),
    )

kx, ky = jax.random.split(jax.random.PRNGKey(7))
x = jax.random.normal(kx, (8, 8, 8, 3))
y = jax.random.normal(ky, (8, 8, 8, 3))
rng = jax.random.PRNGKey(3)

grad_fn = jax.jit(jax.grad(lambda p, r, x, y: model.loss(p, r, x, y)[0]))

# single-device baseline
mesh1 = make_mesh(jax.devices()[:1])
g1 = grad_fn(replicate(mesh1, params), rng, shard_batch(mesh1, x), shard_batch(mesh1, y))
s1 = replicate(mesh1, fresh_state())
s1, m1 = jax.jit(step_fn)(s1, shard_batch(mesh1, x), shard_batch(mesh1, y), rng)
"""

_SCRIPT = _PRELUDE + r"""
# 8-device data parallel: the psum'd gradient must equal the single-device one
mesh8 = make_mesh(jax.devices())
g8 = grad_fn(replicate(mesh8, params), rng, shard_batch(mesh8, x), shard_batch(mesh8, y))
s8 = replicate(mesh8, fresh_state())
s8, m8 = jax.jit(step_fn)(s8, shard_batch(mesh8, x), shard_batch(mesh8, y), rng)

# reduction order across shards differs -> small float drift is expected
np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4, atol=1e-6)
for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5)

# the sharded step actually trains (params move)
changed = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
    jax.tree_util.tree_leaves(s8.params), jax.tree_util.tree_leaves(params)))
assert changed > 0
print("SHARDING-OK")
"""


def test_data_parallel_grad_equality():
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
    )
    assert "SHARDING-OK" in res.stdout, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr[-3000:]}"


_TP_SCRIPT = _PRELUDE + r"""
# the policy actually shards something on this model (model-axis width 4)
n_sharded = sum(1 for l in jax.tree_util.tree_leaves(params)
                if leaf_spec(l, 4) != P())
assert n_sharded > 0, "TP policy sharded nothing on the tiny UNet"

# 2-way data x 4-way tensor parallel: same math, different layout
mesh24 = make_mesh(jax.devices(), model_parallel=4)
g24 = grad_fn(place_state(mesh24, params, 4), rng,
              shard_batch(mesh24, x), shard_batch(mesh24, y))
s24 = place_state(mesh24, fresh_state(), 4)
s24, m24 = jax.jit(step_fn)(s24, shard_batch(mesh24, x), shard_batch(mesh24, y), rng)

np.testing.assert_allclose(float(m1["loss"]), float(m24["loss"]), rtol=1e-4, atol=1e-6)
for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g24)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5)

# post-Adam params match the single-device step; absolute tolerance absorbs
# near-zero-gradient leaves where m/(sqrt(v)+eps) amplifies reduction-order
# noise (update magnitudes there are ~lr = 1e-4)
for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                jax.tree_util.tree_leaves(s24.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-3, atol=2e-4)

# the TP step actually trains (params move)
changed = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
    jax.tree_util.tree_leaves(s24.params), jax.tree_util.tree_leaves(params)))
assert changed > 0
print("TP-SHARDING-OK")
"""


def test_tensor_parallel_step_equality():
    """training.model_parallel: a DPxTP (2x4) step must produce the same
    updated params as the single-device step — GSPMD layout, identical math
    (parallel/tp.py)."""
    res = subprocess.run(
        [sys.executable, "-c", _TP_SCRIPT],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
    )
    assert "TP-SHARDING-OK" in res.stdout, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr[-3000:]}"


_FSDP_SCRIPT = _PRELUDE + r"""
# the FSDP policy shards leaves the TP policy leaves replicated (biases,
# conv input-feature dims) over 'data'
n_fsdp = sum(1 for l in jax.tree_util.tree_leaves(params)
             if leaf_spec(l, 1, 8) != P())
n_tp4 = sum(1 for l in jax.tree_util.tree_leaves(params)
            if leaf_spec(l, 4) != P())
assert n_fsdp > n_tp4 > 0, (n_fsdp, n_tp4)

# 8-way FSDP (ZeRO-3 layout): same math as the replicated-state DP step
mesh8 = make_mesh(jax.devices())
g8 = grad_fn(place_state(mesh8, params, 1, fsdp=True), rng,
             shard_batch(mesh8, x), shard_batch(mesh8, y))
s8 = place_state(mesh8, fresh_state(), 1, fsdp=True)

# per-chip memory actually drops: a sharded leaf's addressable shard is 1/8
big = max(jax.tree_util.tree_leaves(s8.params), key=lambda l: l.size)
assert not big.sharding.is_fully_replicated
shard_sz = big.addressable_shards[0].data.size
assert shard_sz * 8 == big.size, (shard_sz, big.size)

s8, m8 = jax.jit(step_fn)(s8, shard_batch(mesh8, x), shard_batch(mesh8, y), rng)

np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4, atol=1e-6)
for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5)
# post-Adam params match the single-device step (tolerances as in the TP test)
for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                jax.tree_util.tree_leaves(s8.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4)

# FSDP composes with TP: 2-way data(fsdp) x 4-way model
mesh24 = make_mesh(jax.devices(), model_parallel=4)
s24 = place_state(mesh24, fresh_state(), 4, fsdp=True)
s24, m24 = jax.jit(step_fn)(s24, shard_batch(mesh24, x), shard_batch(mesh24, y), rng)
np.testing.assert_allclose(float(m1["loss"]), float(m24["loss"]), rtol=1e-4, atol=1e-6)
for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                jax.tree_util.tree_leaves(s24.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4)
print("FSDP-SHARDING-OK")
"""


def test_fsdp_step_equality():
    """training.fsdp: the ZeRO-3 layout (params/moments/EMA sharded over
    'data', parallel/tp.py) must produce the same loss/grads/post-Adam params
    as the replicated single-device step, shrink the per-chip shard of the
    big leaves 8x, and compose with model_parallel."""
    res = subprocess.run(
        [sys.executable, "-c", _FSDP_SCRIPT],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
    )
    assert "FSDP-SHARDING-OK" in res.stdout, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr[-3000:]}"


def test_sharded_eval_sampling_matches_single_device(tmp_path):
    """sample_to_eval with the batch sharded over 8 virtual devices produces
    the same samples as the single-device run (same seed/RNG stream) — the
    TPU-native analogue of the reference's rank-sharded eval sweep
    (BaseRunner.py:562-575)."""
    import os

    import numpy as np
    from PIL import Image

    from bbdm_tpu.registry import get_runner
    from tests.test_integration import make_aligned_dataset, make_args, make_config

    data = tmp_path / "data"
    make_aligned_dataset(str(data))

    outs = {}
    for n_mesh in (1, 8):
        cfg = make_config(tmp_path, data, mesh_devices=n_mesh)
        cfg.args = make_args(tmp_path / f"results{n_mesh}", train=False,
                             sample_to_eval=True)
        runner = get_runner("BBDMRunner", cfg)
        runner.test()
        result = os.path.join(runner.config.result.sample_to_eval_path, "4")
        imgs = {}
        for root, _, files in os.walk(result):
            for f in sorted(files):
                key = os.path.relpath(os.path.join(root, f), result)
                imgs[key] = np.asarray(Image.open(os.path.join(root, f)), np.int32)
        assert imgs, result
        outs[n_mesh] = imgs

    assert outs[1].keys() == outs[8].keys()
    for key in outs[1]:
        # identical RNG stream; uint8 quantization leaves at most off-by-one
        # from cross-device reduction order
        assert np.abs(outs[1][key] - outs[8][key]).max() <= 1, key


def test_model_parallel_runner_lifecycle(tmp_path):
    """training.model_parallel: 2 through the FULL runner lifecycle on the
    8-virtual-device mesh — train (grad accumulation over TP-sharded
    moments), mid-train sampling, and checkpointing (device_get of
    model-sharded leaves) all work with the DPxTP layout."""
    import os

    from bbdm_tpu.registry import get_runner
    from tests.test_integration import make_aligned_dataset, make_args, make_config

    data = tmp_path / "data"
    make_aligned_dataset(str(data))
    cfg = make_config(tmp_path, data, mesh_devices=8, model_parallel=2,
                      n_epochs=1, sample_interval=1)
    cfg.args = make_args(tmp_path / "results")
    runner = get_runner("BBDMRunner", cfg)
    assert dict(runner.mesh.shape) == {"data": 4, "model": 2}
    runner.train()
    assert runner.global_step >= 1
    ckpt = os.path.join(runner.config.result.ckpt_path, "last_model.ckpt")
    assert os.path.exists(ckpt)
    img_dir = os.path.join(runner.config.result.image_path, "1")
    assert os.path.isdir(img_dir), img_dir  # mid-train sampling ran

    # resume from the TP-written checkpoint on a pure-DP mesh: the on-disk
    # contract is layout-free
    cfg2 = make_config(tmp_path, data, mesh_devices=1, n_epochs=1)
    cfg2.args = make_args(tmp_path / "results2", resume_model=ckpt)
    cfg2.model.model_load_path = ckpt
    runner2 = get_runner("BBDMRunner", cfg2)
    assert runner2.global_step == runner.global_step


def test_fsdp_runner_lifecycle(tmp_path):
    """training.fsdp: true through the FULL runner lifecycle on the
    8-virtual-device mesh — train (grad accumulation over fsdp-sharded
    buffers), mid-train sampling, checkpointing (device_get of data-sharded
    leaves), and resume of the fsdp-written checkpoint on a plain-DP mesh
    (the on-disk contract is layout-free)."""
    import os

    from bbdm_tpu.registry import get_runner
    from tests.test_integration import make_aligned_dataset, make_args, make_config

    data = tmp_path / "data"
    make_aligned_dataset(str(data))
    cfg = make_config(tmp_path, data, mesh_devices=8, fsdp=True,
                      n_epochs=1, sample_interval=1)
    cfg.args = make_args(tmp_path / "results")
    runner = get_runner("BBDMRunner", cfg)
    assert runner.fsdp and dict(runner.mesh.shape) == {"data": 8, "model": 1}
    runner.train()
    assert runner.global_step >= 1
    ckpt = os.path.join(runner.config.result.ckpt_path, "last_model.ckpt")
    assert os.path.exists(ckpt)
    assert os.path.isdir(os.path.join(runner.config.result.image_path, "1"))

    cfg2 = make_config(tmp_path, data, mesh_devices=1, n_epochs=1)
    cfg2.args = make_args(tmp_path / "results2", resume_model=ckpt)
    cfg2.model.model_load_path = ckpt
    runner2 = get_runner("BBDMRunner", cfg2)
    assert runner2.global_step == runner.global_step


def test_model_parallel_vqgan_runner(tmp_path):
    """The GAN trainer under DPxTP: GANTrainState (two optimizer states,
    BatchNorm stats) goes through the same leaf-wise placement."""
    import os

    from bbdm_tpu.registry import get_runner
    from tests.test_vqgan_training import make_single_image_dataset, make_vqgan_config

    data = tmp_path / "data"
    make_single_image_dataset(data)
    cfg = make_vqgan_config(tmp_path / "results", data, mesh_devices=8,
                            model_parallel=2, sample_interval=1)
    runner = get_runner("VQGANRunner", cfg)
    assert dict(runner.mesh.shape) == {"data": 4, "model": 2}
    runner.train()
    assert os.path.exists(
        os.path.join(runner.config.result.ckpt_path, "last_model.ckpt"))
