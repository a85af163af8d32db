"""CPU smoke of scripts/train_chain_demo.py — the one-client production chain.

Runs the full three-phase chain (in-framework VQGAN first-stage training ->
LBBDM bridge training on that frozen first stage -> sample_to_eval +
PSNR/SSIM) end-to-end as a subprocess on the tiny smoke configs, the same
topology the reference assembles manually from a pretrained LDM checkpoint
(`/root/reference/model/VQGAN/vqgan.py:63-72`).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


@pytest.mark.slow
def test_chain_demo_cpu(tmp_path):
    from make_synthetic_dataset import write_stage

    data_root = tmp_path / "datasets" / "syn64_smoke"
    write_stage(str(data_root), "train", 8, 64, 0)
    write_stage(str(data_root), "val", 4, 64, 1_000_000)
    write_stage(str(data_root), "test", 4, 64, 2_000_000)

    # conftest.py exports XLA_FLAGS=--xla_force_host_platform_device_count=8
    # for the sharding tests; the chain subprocess must see one CPU device or
    # its data mesh would demand batch % 8 == 0
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "train_chain_demo.py"),
            "--cpu",
            "--result", str(tmp_path / "results"),
            "--vqgan-config", os.path.join(REPO, "configs/runs/VQGAN-smoke-cpu.yaml"),
            "--lbbdm-config", os.path.join(REPO, "configs/runs/LBBDM-smoke-cpu.yaml"),
            # the time-boxing caps (smoke configs say n_epochs=2; cap to 1)
            "--epochs-a", "1",
            "--epochs-b", "1",
            # phase-D sampler overrides (the euler@50-recipe knobs, tiny here)
            "--bench-sampler", "euler",
            "--bench-sample-step", "3",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert res.returncode == 0, res.stderr[-4000:]

    # per-phase resumable reports (report_<phase>.json under --result)
    def rep(phase):
        path = tmp_path / "results" / f"report_{phase}.json"
        assert path.exists(), (phase, res.stdout[-4000:])
        with open(path) as f:
            return json.load(f)

    report = rep("eval")

    # both phases left their checkpoints where phase C found them
    assert os.path.exists(report["vq_ckpt"])
    assert os.path.exists(report["bridge_ckpt"])

    # --epochs-a/--epochs-b capped both phases (configs say n_epochs=2)
    from bbdm_tpu.checkpoints.io import load_checkpoint

    assert int(load_checkpoint(report["vq_ckpt"])["epoch"]) == 1
    assert int(load_checkpoint(report["bridge_ckpt"])["epoch"]) == 1

    # the sample_to_eval directory contract produced comparable image sets,
    # plus the first stage's own roundtrip ceiling over the same gt images
    for key in ("sample_vs_gt", "condition_vs_gt_floor",
                "vqgan_roundtrip_ceiling"):
        psnr = float(report[key]["psnr"])
        ssim = float(report[key]["ssim"])
        assert 0.0 < psnr < 100.0, (key, psnr)
        assert -1.0 <= ssim <= 1.0, (key, ssim)

    # phase D: delivered-throughput sweep at the canonical sample_num,
    # with the sampler/steps overrides applied and recorded
    tput = rep("throughput")
    assert tput["sample_num"] == 5
    assert tput["delivered_samples_per_sec"] > 0
    assert tput["samples"] == tput["images"] * 5
    assert tput["sampler"] == "euler"
    assert tput["sample_step"] == 3

    # scripts/eval_sampler_sweep.py on the same checkpoints: the euler-vs-heun
    # NFE sweep CLI (reference protocol 200-step euler,
    # `model/BrownianBridge/BrownianBridgeModel.py:203-221`) must run the
    # variants end to end and report comparable PSNR/SSIM rows
    sweep = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "eval_sampler_sweep.py"),
            "--cpu",
            "--lbbdm-config", os.path.join(REPO, "configs/runs/LBBDM-smoke-cpu.yaml"),
            "--vq-ckpt", report["vq_ckpt"],
            "--bridge-ckpt", report["bridge_ckpt"],
            "--result", str(tmp_path / "results_sweep"),
            "--variants", "euler:3,heun:3",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert sweep.returncode == 0, sweep.stderr[-4000:]
    rows = [json.loads(line.split("[sweep] ", 1)[1])
            for line in sweep.stdout.splitlines()
            if line.startswith("[sweep] {")]
    assert [(r["sampler"], r["steps"], r["nfe"]) for r in rows] == [
        ("euler", 3, 3), ("heun", 3, 5)]
    for r in rows:
        assert 0.0 < r["psnr"] < 100.0, r
        assert -1.0 <= r["ssim"] <= 1.0, r

    # per-variant reports make the sweep resumable: a re-run with the same
    # --result must skip both variants (no recompute) yet print the same rows
    rerun = subprocess.run(
        sweep.args, cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert rerun.returncode == 0, rerun.stderr[-4000:]
    assert rerun.stdout.count("report exists, skipping") == 2, rerun.stdout
    rows2 = [json.loads(line.split("[sweep] ", 1)[1])
             for line in rerun.stdout.splitlines()
             if line.startswith("[sweep] {")]
    assert rows2 == []  # skipped variants are read from disk, not re-printed
