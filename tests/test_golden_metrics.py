"""Golden parity of the metric backbones vs torch mirrors (VERDICT r1 #2).

The reference computes FID with ``pytorch_fid`` and LPIPS with the ``lpips``
package (`/root/reference/evaluation/FID.py:10-16`, `evaluation/LPIPS.py:7`).
Those packages aren't installed here, so `tests/torch_mirrors.py` rebuilds
their public architectures in torch with matching state_dict keys. These
tests drive RANDOM-weight mirrors through the state-dict converters and
assert forward parity with the JAX ports — validating both the converters
and every layer-semantics detail (BN eps 1e-3, count_include_pad=False avg
pools, Mixed_7c max-pool, lpips eps placement, slice taps, 1x1 heads).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from bbdm_tpu.evaluation.inception import (  # noqa: E402
    FIDInceptionV3, convert_inception_state_dict,
)
from bbdm_tpu.evaluation.lpips import (  # noqa: E402
    convert_lpips_state_dict, lpips_distance,
)
from tests.torch_mirrors import FIDInceptionMirror, LPIPSMirror  # noqa: E402


def _randomize_bn(module, seed=0):
    """Non-trivial running stats so a wrong BN eps/mean/var mapping shows."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3, generator=g)
                m.running_var.uniform_(0.2, 1.5, generator=g)
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.uniform_(-0.3, 0.3, generator=g)


@pytest.fixture(scope="module")
def inception_pair():
    torch.manual_seed(0)
    mirror = FIDInceptionMirror().eval()
    _randomize_bn(mirror, seed=1)
    params = convert_inception_state_dict(mirror.state_dict())
    return mirror, params


class TestInceptionParity:
    def test_pool3_features_match(self, inception_pair):
        mirror, params = inception_pair
        rs = np.random.RandomState(0)
        x = rs.rand(2, 299, 299, 3).astype(np.float32)
        with torch.no_grad():
            ref = mirror.__class__(resize_input=False).eval()
            ref.load_state_dict(mirror.state_dict())
            y_t = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        model = FIDInceptionV3(resize_input=False)
        y_j = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        assert y_t.shape == y_j.shape == (2, 2048)
        scale = np.abs(y_t).max()
        assert np.abs(y_t - y_j).max() <= 1e-4 * max(scale, 1.0), (
            f"max abs diff {np.abs(y_t - y_j).max()} (feature scale {scale})")

    def test_resize_preprocessing_matches(self, inception_pair):
        """pytorch_fid preprocessing: bilinear resize to 299 (align_corners
        False) + [0,1]->[-1,1]."""
        mirror, params = inception_pair
        rs = np.random.RandomState(1)
        x = rs.rand(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            y_t = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        model = FIDInceptionV3(resize_input=True)
        y_j = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        scale = np.abs(y_t).max()
        assert np.abs(y_t - y_j).max() <= 2e-4 * max(scale, 1.0), (
            f"max abs diff {np.abs(y_t - y_j).max()} (feature scale {scale})")


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_lpips_parity(net):
    torch.manual_seed(2)
    mirror = LPIPSMirror(net=net).eval()
    params = convert_lpips_state_dict(mirror.state_dict(), net)
    # lpips heads are non-negative in the real model; abs() keeps the random
    # mirror in the same regime
    for k in range(5):
        with torch.no_grad():
            getattr(mirror, f"lin{k}").model[1].weight.abs_()
        params[f"lin_{k}"]["kernel"] = np.abs(params[f"lin_{k}"]["kernel"])
    rs = np.random.RandomState(3)
    a = (rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    b = (rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        d_t = mirror(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                     torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()
    d_j = np.asarray(lpips_distance(params, net, jnp.asarray(a), jnp.asarray(b)))
    assert d_t.shape == d_j.shape == (2,)
    np.testing.assert_allclose(d_j, d_t, rtol=1e-4, atol=1e-6)


def test_fid_end_to_end(tmp_path, inception_pair):
    """calc_FID over two synthetic PNG dirs vs the same computation driven
    through the torch mirror — validates image IO + feature + Fréchet glue."""
    from PIL import Image

    from bbdm_tpu.evaluation.fid import (
        activation_statistics, calc_FID, frechet_distance,
    )

    mirror, _ = inception_pair
    weights = tmp_path / "inception.pth"
    torch.save(mirror.state_dict(), str(weights))

    rs = np.random.RandomState(4)
    dirs, imgs = [], []
    for name, shift in (("d1", 0.0), ("d2", 0.25)):
        d = tmp_path / name
        d.mkdir()
        arrs = np.clip(rs.rand(6, 32, 32, 3) * 0.75 + shift, 0, 1)
        for i, a in enumerate(arrs):
            Image.fromarray((a * 255).astype(np.uint8)).save(d / f"{i}.png")
        dirs.append(str(d))
        # re-read so both stacks see identical uint8-quantized pixels
        imgs.append(np.stack([
            np.asarray(Image.open(d / f"{i}.png"), np.float32) / 255.0
            for i in range(6)
        ]))

    fid_jax = calc_FID(dirs[0], dirs[1], weights_path=str(weights), batch_size=6)

    with torch.no_grad():
        feats = [mirror(torch.from_numpy(im.transpose(0, 3, 1, 2))).numpy()
                 for im in imgs]
    fid_torch = frechet_distance(*activation_statistics(feats[0]),
                                 *activation_statistics(feats[1]))
    assert fid_jax == pytest.approx(fid_torch, rel=1e-3, abs=1e-4)
