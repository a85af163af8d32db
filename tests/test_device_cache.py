"""HBM-resident dataset cache (data/device_cache.py) — round-5 response to
the measured axon per-transfer host leak (scripts/probe_host_leak.py).

The load-bearing property: batches are BIT-IDENTICAL to the host loader's
(the wrapped loader's own seeded index stream drives the on-device gather),
so enabling `training.device_data_cache` cannot change training numerics —
asserted both loader-level and through a full runner train()."""

from __future__ import annotations

import os

import jax
import numpy as np
import pytest

from bbdm_tpu.config import dict2namespace
from bbdm_tpu.data import DataLoader
from bbdm_tpu.data.device_cache import DeviceCachedLoader, maybe_device_cache
from bbdm_tpu.parallel import make_mesh

from tests.test_integration import make_aligned_dataset, make_args, make_config


def _dataset(root, dataset_type="custom_aligned", image_size=8):
    from bbdm_tpu.registry import Registers

    cfg = dict2namespace({
        "dataset_path": str(root), "image_size": image_size, "channels": 3,
        "to_normal": True, "flip": False,
    })
    return Registers.datasets[dataset_type](cfg, stage="train")


def test_batches_identical_to_host_loader(tmp_path):
    make_aligned_dataset(str(tmp_path), n=10)
    ds = _dataset(tmp_path)
    mesh = make_mesh(jax.devices()[:1])
    host = DataLoader(ds, 4, shuffle=True, drop_last=True, seed=7)
    dev = DeviceCachedLoader(
        DataLoader(ds, 4, shuffle=True, drop_last=True, seed=7), mesh)
    for epoch in (0, 1):  # two epochs: the per-epoch reshuffle must match
        host.set_epoch(epoch)
        dev.set_epoch(epoch)
        hb = list(host)
        db = list(dev)
        assert len(hb) == len(db) == 2
        for h, d in zip(hb, db):
            assert h["x_name"] == d["x_name"]
            assert h["x_cond_name"] == d["x_cond_name"]
            np.testing.assert_array_equal(h["x"], np.asarray(d["x"]))
            np.testing.assert_array_equal(h["x_cond"], np.asarray(d["x_cond"]))


def test_identity_stream_stored_once(tmp_path):
    # custom_single returns (item, item): the cache must not store it twice
    d = tmp_path / "train"
    os.makedirs(d)
    from PIL import Image

    for i in range(4):
        Image.fromarray(np.full((8, 8, 3), i * 10, np.uint8)).save(
            d / f"im_{i}.png")
    ds = _dataset(tmp_path, dataset_type="custom_single")
    mesh = make_mesh(jax.devices()[:1])
    dev = DeviceCachedLoader(DataLoader(ds, 2, shuffle=False), mesh)
    assert dev._data_c is dev._data_x
    b = next(iter(dev))
    np.testing.assert_array_equal(np.asarray(b["x"]), np.asarray(b["x_cond"]))


def test_refuses_epoch_seeded_datasets(tmp_path):
    make_aligned_dataset(str(tmp_path), n=4)
    ds = _dataset(tmp_path)
    ds.set_epoch_seed = lambda seed: None  # inpainting-style dataset
    mesh = make_mesh(jax.devices()[:1])
    with pytest.raises(ValueError, match="per-epoch randomness"):
        DeviceCachedLoader(DataLoader(ds, 2), mesh)


def test_hbm_cap(tmp_path, monkeypatch):
    make_aligned_dataset(str(tmp_path), n=4)
    ds = _dataset(tmp_path)
    mesh = make_mesh(jax.devices()[:1])
    monkeypatch.setenv("BBDM_DEVICE_CACHE_MB", "0.001")
    with pytest.raises(ValueError, match="BBDM_DEVICE_CACHE_MB"):
        DeviceCachedLoader(DataLoader(ds, 2), mesh)


def test_bfloat16_storage(tmp_path):
    make_aligned_dataset(str(tmp_path), n=4)
    ds = _dataset(tmp_path)
    mesh = make_mesh(jax.devices()[:1])
    host = DataLoader(ds, 2, shuffle=False)
    dev = DeviceCachedLoader(DataLoader(ds, 2, shuffle=False), mesh,
                             dtype="bfloat16")
    h = next(iter(host))
    d = next(iter(dev))
    x = np.asarray(d["x"])
    assert x.dtype == np.float32  # gather casts back
    # 8-bit image data survives bf16 storage to well under one PNG
    # quantization step (2/255 in [-1,1])
    assert float(np.abs(h["x"] - x).max()) < 2.0 / 255.0


def test_multihost_falls_back(tmp_path):
    make_aligned_dataset(str(tmp_path), n=4)
    ds = _dataset(tmp_path)
    mesh = make_mesh(jax.devices()[:1])
    loader = DataLoader(ds, 2)
    training = dict2namespace({"device_data_cache": False})
    assert maybe_device_cache(loader, mesh, training) is loader


def test_runner_numerics_unchanged(tmp_path):
    """Full BBDMRunner.train() with and without the device cache: same
    seeds, same batches -> the logged train losses must match exactly."""
    from bbdm_tpu.registry import get_runner

    data = tmp_path / "data"
    make_aligned_dataset(str(data))

    losses = {}
    for flag in (False, True):
        cfg = make_config(tmp_path, str(data), n_epochs=1,
                          accumulate_grad_batches=1,
                          device_data_cache=flag)
        cfg.args = make_args(tmp_path / f"res_{flag}")
        runner = get_runner("BBDMRunner", cfg)
        # drive exactly one train step through the loader + step function
        loader, val_loader, _ = runner._build_loaders()
        loader.set_epoch(0)
        batch = next(iter(loader))
        x, y = runner._put_batch(batch)
        _, metrics = runner._train_step(runner.state, x, y,
                                        jax.random.PRNGKey(3))
        losses[flag] = float(metrics["loss"])
    assert losses[False] == pytest.approx(losses[True], abs=0.0), losses


def test_test_mode_skips_train_cache(tmp_path):
    """_build_loaders(for_training=False) must NOT build device caches:
    test()/sample_to_eval never iterate the train split, and the eager
    decode+upload of a production train set costs minutes per sweep variant
    (observed ~13 min for the 4.5 GB 256^2 chain dataset)."""
    from bbdm_tpu.registry import get_runner

    data = tmp_path / "data"
    make_aligned_dataset(str(data))
    cfg = make_config(tmp_path, str(data), n_epochs=1,
                      accumulate_grad_batches=1, device_data_cache=True)
    cfg.args = make_args(tmp_path / "res")
    runner = get_runner("BBDMRunner", cfg)

    train_loader, val_loader, _ = runner._build_loaders(for_training=False)
    assert isinstance(train_loader, DataLoader)
    assert isinstance(val_loader, DataLoader)
    assert not isinstance(train_loader, DeviceCachedLoader)
    assert not isinstance(val_loader, DeviceCachedLoader)

    # the training path still caches
    train_loader, val_loader, _ = runner._build_loaders()
    assert isinstance(train_loader, DeviceCachedLoader)
    assert isinstance(val_loader, DeviceCachedLoader)
