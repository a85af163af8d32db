"""Dataset-layer unit tests: all five registered types, flip-doubling,
inpainting mask geometry, loader sharding/shuffle determinism
(SURVEY.md §4 unit plan)."""

import os

import numpy as np
import pytest
from PIL import Image

from bbdm_tpu.config import dict2namespace
from bbdm_tpu.data import DataLoader, get_dataset
from bbdm_tpu.registry import Registers


@pytest.fixture(autouse=True)
def _image_cache_guard():
    """Guarantee the process-wide RAM cache is empty before AND after every
    test here, even when an assertion fails mid-test (ADVICE round 3)."""
    from bbdm_tpu.data.base import clear_image_cache

    clear_image_cache()
    yield
    clear_image_cache()


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    """root/flat/<stage>/*.png for single-dir types; root/aligned/<stage>/{A,B}."""
    root = tmp_path_factory.mktemp("ds")
    rs = np.random.RandomState(0)
    for stage in ("train", "val", "test"):
        os.makedirs(root / "flat" / stage, exist_ok=True)
        for side in ("A", "B"):
            os.makedirs(root / "aligned" / stage / side, exist_ok=True)
        for i in range(6):
            arr = rs.randint(0, 255, (16, 16, 3), np.uint8)
            Image.fromarray(arr).save(root / "flat" / stage / f"img_{i}.png")
            Image.fromarray(arr).save(root / "aligned" / stage / "A" / f"img_{i}.png")
            Image.fromarray(255 - arr).save(root / "aligned" / stage / "B" / f"img_{i}.png")
    return root


def _cfg(root, flip=False, size=16):
    return dict2namespace({
        "dataset_path": str(root), "image_size": size,
        "channels": 3, "to_normal": True, "flip": flip,
    })


def test_all_five_types_registered():
    for name in ("custom_single", "custom_aligned", "custom_colorization_RGB",
                 "custom_colorization_LAB", "custom_inpainting"):
        assert name in Registers.datasets


def test_custom_single_pairs_self(image_root):
    ds = Registers.datasets["custom_single"](_cfg(image_root / "flat"), stage="train")
    (x, xn), (c, cn) = ds[0]
    np.testing.assert_array_equal(x, c)
    assert xn == cn


def test_custom_aligned_pairs_b_with_a(image_root):
    ds = Registers.datasets["custom_aligned"](_cfg(image_root / "aligned"), stage="train")
    (x, xn), (c, cn) = ds[0]
    # B is the inverted A in the fixture: x ~= -c in [-1,1] space
    np.testing.assert_allclose(x, -c, atol=3 / 127.5)
    assert xn == cn == "img_0"


def test_flip_doubles_length_and_mirrors(image_root):
    ds = Registers.datasets["custom_single"](_cfg(image_root / "flat", flip=True), stage="train")
    assert len(ds) == 12
    (x, _), _ = ds[0]
    (xf, _), _ = ds[6]
    np.testing.assert_allclose(xf, x[:, ::-1, :], atol=2 / 127.5)


def test_flip_off_for_eval_stages(image_root):
    ds = Registers.datasets["custom_single"](_cfg(image_root / "flat", flip=True), stage="val")
    assert len(ds) == 6


def test_colorization_rgb_condition_is_gray(image_root):
    ds = Registers.datasets["custom_colorization_RGB"](_cfg(image_root / "flat"), stage="train")
    (x, _), (cond, _) = ds[0]
    # all three channels identical
    np.testing.assert_array_equal(cond[..., 0], cond[..., 1])
    np.testing.assert_array_equal(cond[..., 1], cond[..., 2])
    # luma relation holds
    lum = (x + 1) / 2
    L = lum[..., 0] * 0.299 + lum[..., 1] * 0.587 + lum[..., 2] * 0.114
    np.testing.assert_allclose((cond[..., 0] + 1) / 2, L, atol=2e-2)


def test_colorization_lab_shapes(image_root):
    ds = Registers.datasets["custom_colorization_LAB"](_cfg(image_root / "flat"), stage="train")
    (x, xn), (cond, cn) = ds[0]
    assert x.shape == (16, 16, 3) and cond.shape == (16, 16, 3)
    assert np.abs(x).max() <= 1.0
    np.testing.assert_array_equal(cond[..., 0], cond[..., 1])


def test_inpainting_mask_geometry():
    # 256^2 images so the reference's 128-180px box fits
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        os.makedirs(os.path.join(root, "train"))
        Image.fromarray(np.full((256, 256, 3), 255, np.uint8)).save(
            os.path.join(root, "train", "white.png"))
        cfg = dict2namespace({"dataset_path": root, "image_size": 256,
                              "channels": 3, "to_normal": True, "flip": False})
        ds = Registers.datasets["custom_inpainting"](cfg, stage="train")
        (x, _), (cond, _) = ds[0]
        # masked region is exactly -1 (zero in [0,1] terms times mask -> 0
        # then the image was already normalized; cond = img * mask so masked
        # pixels are 0.0 in [-1,1] space)
        masked = np.isclose(cond[..., 0], 0.0)
        area = masked.mean()
        assert (128 * 128) / (256 * 256) - 0.01 <= area <= (180 * 180) / (256 * 256) + 0.01
        # the mask is one contiguous axis-aligned box
        rows = np.where(masked.any(axis=1))[0]
        cols = np.where(masked.any(axis=0))[0]
        assert masked[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1].all()
        assert 128 <= len(rows) <= 180 and 128 <= len(cols) <= 180


def test_inpainting_mask_reseeds_per_epoch():
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        os.makedirs(os.path.join(root, "train"))
        Image.fromarray(np.full((256, 256, 3), 255, np.uint8)).save(
            os.path.join(root, "train", "w.png"))
        cfg = dict2namespace({"dataset_path": root, "image_size": 256,
                              "channels": 3, "to_normal": True, "flip": False})
        ds = Registers.datasets["custom_inpainting"](cfg, stage="train")
        ds.set_epoch_seed(1)
        _, (c1, _) = ds[0]
        ds.set_epoch_seed(2)
        _, (c2, _) = ds[0]
        ds.set_epoch_seed(1)
        _, (c1b, _) = ds[0]
        assert np.abs(c1 - c2).max() > 0  # different epochs differ
        np.testing.assert_array_equal(c1, c1b)  # same seed reproduces


class TestLoader:
    def _ds(self, root):
        return Registers.datasets["custom_aligned"](_cfg(root / "aligned"), stage="train")

    def test_drop_last_and_batch_shapes(self, image_root):
        loader = DataLoader(self._ds(image_root), batch_size=4, shuffle=False)
        batches = list(loader)
        assert len(batches) == 1  # 6 imgs / 4 -> 1 full batch
        assert batches[0]["x"].shape == (4, 16, 16, 3)
        assert len(batches[0]["x_name"]) == 4

    def test_epoch_shuffle_deterministic(self, image_root):
        l1 = DataLoader(self._ds(image_root), 4, shuffle=True, seed=7)
        l2 = DataLoader(self._ds(image_root), 4, shuffle=True, seed=7)
        l1.set_epoch(3)
        l2.set_epoch(3)
        b1, b2 = next(iter(l1)), next(iter(l2))
        assert b1["x_name"] == b2["x_name"]
        l2.set_epoch(4)
        b3 = next(iter(l2))
        assert b1["x_name"] != b3["x_name"]

    def test_sharding_partitions_all_items(self, image_root):
        ds = self._ds(image_root)
        names = set()
        for shard in range(3):
            loader = DataLoader(ds, 2, shuffle=False, shard_count=3, shard_index=shard)
            for batch in loader:
                names.update(batch["x_name"])
        assert names == {f"img_{i}" for i in range(6)}

    def test_loader_len(self, image_root):
        assert len(DataLoader(self._ds(image_root), 2)) == 3
        assert len(DataLoader(self._ds(image_root), 4)) == 1
        assert len(DataLoader(self._ds(image_root), 4, drop_last=False)) == 2


def test_loader_parallel_decode_deterministic(image_root):
    """num_workers>1 (thread-pool item decode) yields byte-identical batches
    to the serial path — order via pool.map, per-index RNG for masks."""
    ds = Registers.datasets["custom_aligned"](
        _cfg(image_root / "aligned"), stage="train")
    kw = dict(batch_size=3, shuffle=True, seed=5, prefetch=0)
    serial = list(DataLoader(ds, num_workers=0, **kw))
    threaded = list(DataLoader(ds, num_workers=4, **kw))
    assert len(serial) == len(threaded) == len(ds) // 3
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["x_cond"], b["x_cond"])
        assert a["x_name"] == b["x_name"]


def _cfg_cached(root, flip=False, size=16):
    cfg = _cfg(root, flip=flip, size=size)
    cfg.cache_in_ram = True
    return cfg


def test_cache_in_ram_bit_identical_and_write_protected(image_root):
    """cache_in_ram serves decoded arrays from RAM: bit-identical to the
    uncached path, write-protected, and the repeat access is a memo hit."""
    from bbdm_tpu.data.base import clear_image_cache

    clear_image_cache()
    cold = Registers.datasets["custom_aligned"](_cfg(image_root / "aligned"),
                                                stage="train")
    hot = Registers.datasets["custom_aligned"](_cfg_cached(image_root / "aligned"),
                                               stage="train")
    for i in range(len(cold)):
        (x0, _), (c0, _) = cold[i]
        (x1, _), (c1, _) = hot[i]
        np.testing.assert_array_equal(x0, x1)
        np.testing.assert_array_equal(c0, c1)

    (x1, _), _ = hot[0]
    (x2, _), _ = hot[0]
    assert x1 is x2  # memo hit returns the same array object
    assert not x1.flags.writeable  # read-only contract
    with np.testing.assert_raises(ValueError):
        x1[0, 0, 0] = 0.0
    clear_image_cache()


def test_cache_in_ram_keys_flip_variants_separately(image_root):
    from bbdm_tpu.data.base import clear_image_cache

    clear_image_cache()
    ds = Registers.datasets["custom_single"](
        _cfg_cached(image_root / "flat", flip=True), stage="train")
    n = len(ds) // 2
    (plain, _), _ = ds[0]
    (flipped, _), _ = ds[n]
    np.testing.assert_array_equal(plain[:, ::-1, :], flipped)
    assert plain is not flipped
    clear_image_cache()


def test_cache_in_ram_through_loader_matches_uncached(image_root):
    """Whole-pipeline check: batches through the threaded DataLoader are
    identical with and without the RAM cache."""
    from bbdm_tpu.data.base import clear_image_cache
    from bbdm_tpu.data.loader import DataLoader

    clear_image_cache()
    mk = Registers.datasets["custom_aligned"]
    cold = DataLoader(mk(_cfg(image_root / "aligned"), stage="val"),
                      batch_size=2, shuffle=False, drop_last=False)
    hot = DataLoader(mk(_cfg_cached(image_root / "aligned"), stage="val"),
                     batch_size=2, shuffle=False, drop_last=False)
    for _ in range(2):  # second epoch = pure cache hits
        for b0, b1 in zip(cold, hot):
            np.testing.assert_array_equal(b0["x"], b1["x"])
            np.testing.assert_array_equal(b0["x_cond"], b1["x_cond"])
    clear_image_cache()


def test_cache_in_ram_applies_to_lab_dataset(image_root):
    """cache_in_ram used to be a silent no-op for the cv2-decoded LAB type
    (ADVICE round 3) — now it memoizes like the load_image path."""
    pytest.importorskip("cv2")
    mk = Registers.datasets["custom_colorization_LAB"]
    cold = mk(_cfg(image_root / "flat"), stage="train")
    hot = mk(_cfg_cached(image_root / "flat"), stage="train")
    (x0, _), (c0, _) = cold[0]
    (x1, _), (c1, _) = hot[0]
    np.testing.assert_array_equal(x0, x1)
    np.testing.assert_array_equal(c0, c1)
    (x2, _), _ = hot[0]
    assert x1 is x2  # memo hit
    assert not x1.flags.writeable


def test_cache_in_ram_cap_fails_loudly(image_root, monkeypatch):
    """Exceeding BBDM_CACHE_CAP_MB raises with the knobs named instead of
    silently filling host RAM (ADVICE round 3)."""
    from bbdm_tpu.data import base as data_base

    monkeypatch.setattr(data_base, "_RAM_CACHE_CAP_BYTES", 1024)  # ~1 KB
    ds = Registers.datasets["custom_single"](
        _cfg_cached(image_root / "flat"), stage="train")
    with pytest.raises(RuntimeError, match="BBDM_CACHE_CAP_MB"):
        ds[0]  # a 16x16x3 fp32 image is 3 KB > the 1 KB cap
