"""Evaluation harness tests: Fréchet math, diversity protocol, CLI file ops,
LPIPS distance identities, Inception port structure."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')
from PIL import Image

from bbdm_tpu.evaluation.diversity import calc_diversity
from bbdm_tpu.evaluation.fid import activation_statistics, frechet_distance
from bbdm_tpu.evaluation.pixel_metrics import calc_psnr_ssim


class TestFrechet:
    def test_identical_distributions_zero(self):
        rs = np.random.RandomState(0)
        f = rs.randn(500, 8)
        mu, sigma = activation_statistics(f)
        assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)

    def test_mean_shift(self):
        # two isotropic gaussians, same cov: d^2 == |mu1-mu2|^2
        mu1, mu2 = np.zeros(4), np.ones(4) * 2.0
        sigma = np.eye(4)
        assert frechet_distance(mu1, sigma, mu2, sigma) == pytest.approx(16.0, rel=1e-6)

    def test_variance_difference(self):
        # N(0, a I) vs N(0, b I): d^2 = dim * (sqrt(a) - sqrt(b))^2
        sigma1, sigma2 = np.eye(3) * 4.0, np.eye(3) * 1.0
        d = frechet_distance(np.zeros(3), sigma1, np.zeros(3), sigma2)
        assert d == pytest.approx(3 * (2 - 1) ** 2, rel=1e-6)


class TestDiversity:
    def test_known_std(self, tmp_path):
        # two inputs x two samples with constant images 100 and 200:
        # per-pixel std = 50 everywhere
        for i in range(2):
            d = tmp_path / str(i)
            d.mkdir()
            for j, val in enumerate((100, 200)):
                Image.fromarray(np.full((4, 4, 3), val, np.uint8)).save(
                    d / f"output_{j}.png")
        div = calc_diversity(str(tmp_path), num_samples=2)
        assert div == pytest.approx(50.0, rel=1e-6)

    def test_identical_samples_zero(self, tmp_path):
        d = tmp_path / "0"
        d.mkdir()
        img = np.random.RandomState(0).randint(0, 255, (4, 4, 3), np.uint8)
        for j in range(3):
            Image.fromarray(img).save(d / f"output_{j}.png")
        assert calc_diversity(str(tmp_path), num_samples=3) == pytest.approx(0.0)


class TestPixelMetrics:
    def test_identical_images(self, tmp_path):
        a, b = tmp_path / "a", tmp_path / "b"
        a.mkdir(), b.mkdir()
        img = np.random.RandomState(1).randint(0, 255, (8, 8, 3), np.uint8)
        Image.fromarray(img).save(a / "x.png")
        Image.fromarray(img).save(b / "x.png")
        out = calc_psnr_ssim(str(a), str(b))
        assert out["mse"] == 0.0 and out["ssim"] == pytest.approx(1.0)


class TestCLI:
    def _tree(self, tmp_path):
        src = tmp_path / "src"
        for name in ("imgB", "imgA"):
            d = src / name
            d.mkdir(parents=True)
            for j in range(2):
                Image.fromarray(np.full((4, 4, 3), 10 * (j + 1), np.uint8)).save(
                    d / f"output_{j}.png")
        return src

    def test_rename_and_copy_samples(self, tmp_path):
        src = self._tree(tmp_path)
        env = dict(os.environ)
        r = subprocess.run(
            [sys.executable, "preprocess_and_evaluation.py", "-f", "rename_samples",
             "-r", str(tmp_path), "-s", "src", "-t", "renamed"],
            capture_output=True, text=True, cwd="/root/repo", env=env)
        assert r.returncode == 0, r.stderr
        assert sorted(os.listdir(tmp_path / "renamed")) == ["0", "1"]

        r = subprocess.run(
            [sys.executable, "preprocess_and_evaluation.py", "-f", "copy_samples",
             "-r", str(tmp_path), "-s", "src", "-t", "flat"],
            capture_output=True, text=True, cwd="/root/repo", env=env)
        assert r.returncode == 0, r.stderr
        assert sorted(os.listdir(tmp_path / "flat")) == ["imgA.png", "imgB.png"]

    def test_missing_weights_message(self, tmp_path):
        src = self._tree(tmp_path)
        env = {k: v for k, v in os.environ.items() if k != "BBDM_FID_WEIGHTS"}
        r = subprocess.run(
            [sys.executable, "preprocess_and_evaluation.py", "-f", "FID",
             "-s", str(src), "-t", str(src)],
            capture_output=True, text=True, cwd="/root/repo", env=env)
        assert r.returncode != 0
        assert "BBDM_FID_WEIGHTS" in r.stderr


class TestLPIPSMath:
    def _params(self):
        rs = np.random.RandomState(0)
        params = {}
        # alexnet conv shapes (HWIO)
        shapes = {0: (11, 11, 3, 64), 3: (5, 5, 64, 192), 6: (3, 3, 192, 384),
                  8: (3, 3, 384, 256), 10: (3, 3, 256, 256)}
        for idx, sh in shapes.items():
            params[f"conv_{idx}"] = {
                "kernel": rs.randn(*sh).astype(np.float32) * 0.05,
                "bias": rs.randn(sh[-1]).astype(np.float32) * 0.05,
            }
        for k, c in enumerate((64, 192, 384, 256, 256)):
            params[f"lin_{k}"] = {"kernel": np.abs(rs.randn(c, 1)).astype(np.float32)}
        return params

    def test_self_distance_zero_and_symmetry(self):
        from bbdm_tpu.evaluation.lpips import lpips_distance

        params = self._params()
        rs = np.random.RandomState(1)
        a = jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
        b = jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
        daa = float(lpips_distance(params, "alex", a, a)[0])
        dab = float(lpips_distance(params, "alex", a, b)[0])
        dba = float(lpips_distance(params, "alex", b, a)[0])
        assert daa == pytest.approx(0.0, abs=1e-6)
        assert dab > 0
        assert dab == pytest.approx(dba, rel=1e-5)


class TestLPIPSBatchedProtocols:
    """The directory protocols dispatch fixed-shape batches (VERDICT r3 #6);
    results must match the naive one-pair-at-a-time evaluation."""

    def _params(self):
        return TestLPIPSMath._params(self)

    def _tree(self, tmp_path, total=5, num_samples=3, size=32):
        rs = np.random.RandomState(7)
        gt = tmp_path / "gt"
        data = tmp_path / "data"
        gt.mkdir(), data.mkdir()
        for i in range(total):
            Image.fromarray(rs.randint(0, 255, (size, size, 3), np.uint8)).save(
                gt / f"{i}.png")
            d = data / str(i)
            d.mkdir()
            for j in range(num_samples):
                Image.fromarray(rs.randint(0, 255, (size, size, 3), np.uint8)).save(
                    d / f"output_{j}.png")
        return str(data), str(gt)

    def test_batched_matches_per_pair(self, tmp_path):
        from bbdm_tpu.evaluation.lpips import (
            _sample_tree_pairs, batched_distances, lpips_distance)

        params = self._params()
        data, gt = self._tree(tmp_path)
        total, pairs = _sample_tree_pairs(data, gt, 3)
        assert total == 5 and len(pairs) == 15
        # batch_size 4: three full batches + one padded remainder batch
        got = batched_distances(params, "alex", pairs, batch_size=4)
        for k, (pa, pb) in enumerate(pairs):
            a = jnp.asarray(np.asarray(Image.open(pa), np.float32) / 255.0 * 2 - 1)[None]
            b = jnp.asarray(np.asarray(Image.open(pb), np.float32) / 255.0 * 2 - 1)[None]
            want = float(lpips_distance(params, "alex", a, b)[0])
            assert got[k] == pytest.approx(want, rel=2e-4, abs=1e-6)

    def test_calc_and_maxmin_protocols(self, tmp_path, monkeypatch):
        import bbdm_tpu.evaluation.lpips as L

        params = self._params()
        monkeypatch.setattr(L, "load_lpips_params", lambda *a, **k: params)
        data, gt = self._tree(tmp_path)
        avg = L.calc_LPIPS(data, gt, num_samples=3, batch_size=4)
        dists = L._distance_matrix(data, gt, 3, params, "alex")
        assert avg == pytest.approx(float(dists.mean()), rel=1e-5)
        max_l, min_l = L.find_max_min_LPIPS(data, gt, num_samples=3)
        # every draw averages one column choice per row: bounded by the
        # per-row min/max means
        assert min_l >= float(dists.min(axis=1).mean()) - 1e-6
        assert max_l <= float(dists.max(axis=1).mean()) + 1e-6
        assert min_l <= max_l


class TestInceptionPort:
    def test_output_is_2048(self):
        from bbdm_tpu.evaluation.inception import FIDInceptionV3

        model = FIDInceptionV3(resize_input=False)  # small input for CPU test
        x = jnp.zeros((1, 75, 75, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        out = model.apply({"params": params}, x)
        assert out.shape == (1, 2048)
        # all FID-relevant torch modules present for the converter
        assert "Mixed_7c" in params and "Conv2d_1a_3x3" in params


class TestRandomInceptionFabrication:
    def test_fabricated_backbone_yields_discriminative_features(self, tmp_path):
        """scripts/make_random_inception.py writes a torch .pth that (a) goes
        through the SAME converter as real weights and (b) produces pool3
        features with nonzero spread — torch's default conv init collapses
        the ~20-conv stack to ~0 features (FID ~1e-42 between ANY two sets),
        which is what the He re-init in the script exists to prevent."""
        out = str(tmp_path / "fid_inception_rand.pth")
        r = subprocess.run(
            [sys.executable, "scripts/make_random_inception.py",
             "--out", out, "--seed", "3"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]

        from bbdm_tpu.evaluation.fid import load_fid_params
        from bbdm_tpu.evaluation.inception import FIDInceptionV3

        params = load_fid_params(out)
        model = FIDInceptionV3(resize_input=False)
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(2, 75, 75, 3).astype(np.float32))
        feats = np.asarray(model.apply({"params": params}, x))
        assert feats.shape == (2, 2048)
        assert np.all(np.isfinite(feats))
        # discriminative: distinct inputs -> distinct, non-degenerate features
        assert float(np.abs(feats[0] - feats[1]).max()) > 1e-3
        assert float(feats.std()) > 1e-3
