"""CPU smoke of scripts/eval_stochastic_demo.py — the round-5 stochastic-
posterior demonstration (train on the multi-modal `--task stochastic` set,
then multi-draw sweeps scored by best-mode PSNR / commit margin / coverage /
the reference diversity protocol).

Also unit-covers the mode-scoring math itself on hand-built trees.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_stochastic_generator_modes(tmp_path):
    """--task stochastic: target is one of the K mode renderings; val/test
    stages emit every mode under B_modes/."""
    from make_synthetic_dataset import write_stage

    root = tmp_path / "ds"
    write_stage(str(root), "test", 3, 32, 2_000_000, task="stochastic",
                blur_sigma=0.5)
    from PIL import Image

    names = sorted(os.listdir(root / "test" / "B"))
    assert len(names) == 3
    modes = sorted(os.listdir(root / "test" / "B_modes"))
    assert len(modes) == 12  # 3 images x 4 modes
    for name in names:
        b = np.asarray(Image.open(root / "test" / "B" / name))
        stem = os.path.splitext(name)[0]
        deltas = [
            np.abs(b.astype(np.int32) - np.asarray(
                Image.open(root / "test" / "B_modes" / f"{stem}_m{k}.png")
            ).astype(np.int32)).mean()
            for k in range(4)
        ]
        assert min(deltas) == 0.0, deltas  # B IS one of the modes, exactly
        assert sorted(deltas)[1] > 10.0, deltas  # and far from the others

    # train stage must NOT leak the mode renderings
    write_stage(str(root), "train", 2, 32, 0, task="stochastic",
                blur_sigma=0.5)
    assert not os.path.exists(root / "train" / "B_modes")


def test_score_mode_tree(tmp_path):
    """Scoring math on a hand-built tree with known commitment/coverage."""
    from eval_stochastic_demo import score_mode_tree
    from make_synthetic_dataset import make_pair
    from PIL import Image

    modes_dir = tmp_path / "modes"
    result_dir = tmp_path / "result"
    cond_dir = tmp_path / "cond"
    os.makedirs(modes_dir)
    os.makedirs(cond_dir)
    a, _b, mode_imgs = make_pair(7, 32, task="stochastic", blur_sigma=0.5)
    name = "test_00000"
    Image.fromarray(a).save(cond_dir / f"{name}.png")
    for k, m in enumerate(mode_imgs):
        Image.fromarray(m).save(modes_dir / f"{name}_m{k}.png")
    os.makedirs(result_dir / name)
    # draw 0 commits exactly to mode 2; draw 1 mode-AVERAGES modes 0+1
    Image.fromarray(mode_imgs[2]).save(result_dir / name / "output_0.png")
    avg = ((mode_imgs[0].astype(np.float64)
            + mode_imgs[1].astype(np.float64)) / 2).astype(np.uint8)
    Image.fromarray(avg).save(result_dir / name / "output_1.png")

    s = score_mode_tree(str(result_dir), str(modes_dir), str(cond_dir),
                        sample_num=2)
    assert s["images"] == 1 and s["draws_per_image"] == 2
    assert s["best_mode_psnr_min"] < 30.0  # the averaged draw scores badly
    assert s["best_mode_psnr_mean"] > s["best_mode_psnr_min"]
    assert sum(s["mode_histogram"]) == 2
    assert s["mode_histogram"][2] >= 1  # the committed draw found its mode
    assert 1 <= s["mode_coverage_mean"] <= 4
    assert s["commit_margin_db_mean"] > 0


@pytest.mark.slow
def test_stochastic_demo_cpu(tmp_path):
    from make_synthetic_dataset import write_stage

    data_root = tmp_path / "datasets" / "synstoch_smoke"
    write_stage(str(data_root), "train", 8, 32, 0, task="stochastic",
                blur_sigma=0.5)
    write_stage(str(data_root), "val", 4, 32, 1_000_000, task="stochastic",
                blur_sigma=0.5)
    write_stage(str(data_root), "test", 4, 32, 2_000_000, task="stochastic",
                blur_sigma=0.5)

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "eval_stochastic_demo.py"),
            "--cpu",
            "--result", str(tmp_path / "results"),
            "--config",
            os.path.join(REPO, "configs/runs/BBDM-stoch-smoke-cpu.yaml"),
            "--epochs", "1",
            "--variants", "euler:4,heun:3",
            "--sample-num", "2",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert res.returncode == 0, res.stderr[-4000:] + res.stdout[-2000:]

    def rep(phase):
        path = tmp_path / "results" / f"report_{phase}.json"
        assert path.exists(), (phase, res.stdout[-4000:])
        with open(path) as f:
            return json.load(f)

    train = rep("train")
    assert os.path.exists(train["ckpt"])
    for phase, steps, nfe in (("sweep_euler4", 4, 4), ("sweep_heun3", 3, 5)):
        r = rep(phase)
        assert r["nfe"] == nfe
        assert r["images"] == 4 and r["draws_per_image"] == 2
        assert sum(r["mode_histogram"]) == 8  # 4 images x 2 draws
        assert 0.0 < r["best_mode_psnr_mean"] < 99.0
        assert 1.0 <= r["mode_coverage_mean"] <= 4.0
        assert r["diversity"] >= 0.0
