"""fastimage C++ extension: builds, matches PIL resampling, and feeds the loader."""

import numpy as np
import pytest
from PIL import Image

from bbdm_tpu.native.build import fastimage_available
from bbdm_tpu.native.fastimage import preprocess_image

pytestmark = pytest.mark.skipif(
    not fastimage_available(), reason="no C++ toolchain available")


def _pil_reference(arr, out_hw, flip, to_normal):
    img = Image.fromarray(arr)
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    img = img.resize((out_hw[1], out_hw[0]), Image.BILINEAR)
    out = np.asarray(img, dtype=np.float32) / 255.0
    if to_normal:
        out = np.clip(out * 2.0 - 1.0, -1.0, 1.0)
    return out


@pytest.mark.parametrize("flip", [False, True])
@pytest.mark.parametrize("to_normal", [False, True])
def test_matches_pil_downscale(flip, to_normal):
    rs = np.random.RandomState(0)
    arr = rs.randint(0, 255, (64, 48, 3), np.uint8)
    ours = preprocess_image(arr, (16, 12), flip=flip, to_normal=to_normal)
    ref = _pil_reference(arr, (16, 12), flip, to_normal)
    scale = 2.0 if to_normal else 1.0
    # PIL uses 8-bit fixed-point filter coefficients; allow ~1.5/255
    assert np.abs(ours - ref).max() <= scale * 1.5 / 255.0


def test_matches_pil_upscale():
    rs = np.random.RandomState(1)
    arr = rs.randint(0, 255, (8, 8, 3), np.uint8)
    ours = preprocess_image(arr, (16, 16))
    ref = _pil_reference(arr, (16, 16), False, False)
    assert np.abs(ours - ref).max() <= 1.5 / 255.0


def test_identity_size():
    arr = np.random.RandomState(2).randint(0, 255, (16, 16, 3), np.uint8)
    ours = preprocess_image(arr, (16, 16))
    np.testing.assert_allclose(ours, arr.astype(np.float32) / 255.0, atol=1e-5)


def test_loader_uses_native_and_matches_pil_path(tmp_path):
    import os

    from bbdm_tpu.data.base import load_image

    rs = np.random.RandomState(3)
    p = tmp_path / "img.png"
    Image.fromarray(rs.randint(0, 255, (32, 32, 3), np.uint8)).save(p)
    native = load_image(str(p), (16, 16), flip=True, to_normal=True)

    os.environ["BBDM_NATIVE"] = "0"
    try:
        import importlib

        import bbdm_tpu.data.base as base_mod

        importlib.reload(base_mod)
        pil = base_mod.load_image(str(p), (16, 16), flip=True, to_normal=True)
    finally:
        os.environ.pop("BBDM_NATIVE")
        import importlib

        import bbdm_tpu.data.base as base_mod

        importlib.reload(base_mod)
    assert np.abs(native - pil).max() <= 2 * 1.5 / 255.0
