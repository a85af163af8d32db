"""Graceful cooperative stop (runners/base.py train()): wall budget, stop
file, and deferred SIGTERM all end training at a step boundary with an
orderly latest+last save and a NORMAL return — no emergency unwind (an
abrupt TPU-client exit can strand the server-side claim; the reference has
only the exception path, `BaseRunner.py:537-554`)."""

import os
import signal

import pytest

pytestmark = pytest.mark.slow

from bbdm_tpu.registry import get_runner

from tests.test_integration import make_aligned_dataset, make_args, make_config


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("gstop")
    data = root / "data"
    make_aligned_dataset(str(data))
    return root, data


def _resume_epoch(ckpt_dir, root, data, result_name):
    cfg = make_config(root, data)
    cfg.model.model_load_path = os.path.join(ckpt_dir, "last_model.ckpt")
    cfg.model.optim_sche_load_path = os.path.join(ckpt_dir, "last_optim_sche.ckpt")
    cfg.args = make_args(root / result_name, save_top=False)
    return get_runner("BBDMRunner", cfg)


def test_wall_budget_stops_and_saves(workdir):
    root, data = workdir
    # 50 nominal epochs, zero wall budget: the first step boundary stops it
    cfg = make_config(root, data, n_epochs=50, max_wall_sec=0)
    cfg.args = make_args(root / "res_wall", save_top=False)
    runner = get_runner("BBDMRunner", cfg)
    runner.train()  # must RETURN, not raise
    assert runner.global_step == 1

    ckpt_dir = runner.config.result.ckpt_path
    files = os.listdir(ckpt_dir)
    assert "last_model.ckpt" in files and "last_optim_sche.ckpt" in files

    # mid-epoch stop semantics: resume must REDO the partial epoch
    runner2 = _resume_epoch(ckpt_dir, root, data, "res_wall2")
    assert runner2.global_step == 1
    assert runner2.global_epoch == 0


def test_stop_file_stops_and_is_consumed(workdir):
    root, data = workdir
    cfg = make_config(root, data, n_epochs=50)
    cfg.args = make_args(root / "res_stopfile", save_top=False)
    runner = get_runner("BBDMRunner", cfg)
    stop_file = os.path.join(runner.config.result.result_path, "STOP")
    open(stop_file, "w").close()
    runner.train()
    assert runner.global_step == 1
    assert not os.path.exists(stop_file), "stop file must be consumed"
    assert "last_model.ckpt" in os.listdir(runner.config.result.ckpt_path)


def test_vqgan_graceful_stop_redoes_partial_epoch(tmp_path):
    """VQGANRunner mirrors BaseRunner's mid-epoch stop semantics: a graceful
    stop saves epoch = global_epoch (redo the interrupted epoch on resume),
    NOT global_epoch + 1 (which silently skipped the rest of the epoch —
    round-4 advisor finding)."""
    from bbdm_tpu.checkpoints.io import load_checkpoint

    from tests.test_vqgan_training import (make_single_image_dataset,
                                           make_vqgan_config)

    data = tmp_path / "data"
    make_single_image_dataset(data)
    cfg = make_vqgan_config(tmp_path / "res", data,
                            n_epochs=50, max_wall_sec=0)
    runner = get_runner("VQGANRunner", cfg)
    runner.train()  # must RETURN, not raise
    assert runner.global_step == 1

    ckpt_dir = runner.config.result.ckpt_path
    states = load_checkpoint(os.path.join(ckpt_dir, "last_model.ckpt"))
    assert states["epoch"] == 0, "graceful_stop save must redo epoch 0"

    cfg2 = make_vqgan_config(tmp_path / "res2", data)
    cfg2.model.model_load_path = os.path.join(ckpt_dir, "last_model.ckpt")
    cfg2.model.optim_sche_load_path = os.path.join(
        ckpt_dir, "last_optim_sche.ckpt")
    runner2 = get_runner("VQGANRunner", cfg2)
    assert runner2.global_step == 1
    assert runner2.global_epoch == 0
    runner2.train()  # completes the (redone) epoch normally
    states2 = load_checkpoint(
        os.path.join(runner2.config.result.ckpt_path, "last_model.ckpt"))
    assert states2["epoch"] == 1  # epoch_end save resumes at the NEXT epoch


def test_sigterm_defers_to_step_boundary(workdir, monkeypatch):
    root, data = workdir
    cfg = make_config(root, data, n_epochs=50)
    cfg.args = make_args(root / "res_term", save_top=False)
    runner = get_runner("BBDMRunner", cfg)

    # deliver SIGTERM from inside the first step's scalar logging — the
    # handler (installed by train()) must DEFER the stop to the step
    # boundary rather than raising into the emergency path
    orig = runner.writer.add_scalar
    fired = []

    def add_scalar_and_term(*a, **kw):
        if not fired:
            fired.append(True)
            os.kill(os.getpid(), signal.SIGTERM)
        return orig(*a, **kw)

    monkeypatch.setattr(runner.writer, "add_scalar", add_scalar_and_term)
    runner.train()  # graceful: returns normally
    assert fired
    assert runner.global_step >= 1
    assert "last_model.ckpt" in os.listdir(runner.config.result.ckpt_path)
