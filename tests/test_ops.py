"""Op-level golden tests: Pallas flash attention vs XLA reference, GroupNorm
and resize vs torch (torch CPU is available — SURVEY.md §4 golden-value plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

from bbdm_tpu.ops.attention import _xla_attention, multi_head_attention
from bbdm_tpu.ops.flash_attention import flash_attention
from bbdm_tpu.ops.group_norm import group_norm


class TestFlashAttention:
    @pytest.mark.parametrize("shape", [(2, 1, 512, 128), (1, 4, 1024, 128), (1, 1, 256, 256)])
    def test_matches_xla(self, shape):
        B, H, T, D = shape
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], shape, jnp.float32)
        k = jax.random.normal(ks[1], shape, jnp.float32)
        v = jax.random.normal(ks[2], shape, jnp.float32)
        ref = _xla_attention(q, k, v)
        out = flash_attention(q, k, v, 128, 128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_grad_matches_xla(self):
        shape = (1, 2, 256, 128)
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q, k, v = (jax.random.normal(ks[i], shape, jnp.float32) for i in range(3))
        gf = jax.grad(lambda q: flash_attention(q, k, v, 128, 128).sum())(q)
        gr = jax.grad(lambda q: _xla_attention(q, k, v).sum())(q)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-3, atol=1e-4)

    def test_dispatch_uses_xla_for_short_seqs(self):
        shape = (1, 2, 64, 32)
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        q, k, v = (jax.random.normal(ks[i], shape, jnp.float32) for i in range(3))
        out = multi_head_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_xla_attention(q, k, v)), rtol=1e-5, atol=1e-6)


class TestGroupNormGolden:
    def test_matches_torch(self):
        import torch

        x = np.random.RandomState(0).randn(2, 6, 6, 32).astype(np.float32)
        scale = np.random.RandomState(1).randn(32).astype(np.float32)
        bias = np.random.RandomState(2).randn(32).astype(np.float32)

        ours = group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                          num_groups=8, eps=1e-5)

        tx = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
        gn = torch.nn.GroupNorm(8, 32, eps=1e-5)
        with torch.no_grad():
            gn.weight.copy_(torch.from_numpy(scale))
            gn.bias.copy_(torch.from_numpy(bias))
            ref = gn(tx).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    def test_film_and_silu_fusion(self):
        x = jnp.asarray(np.random.RandomState(3).randn(2, 4, 4, 8).astype(np.float32))
        scale = jnp.ones(8)
        bias = jnp.zeros(8)
        fs = jnp.asarray(np.random.RandomState(4).randn(2, 8).astype(np.float32))
        fb = jnp.asarray(np.random.RandomState(5).randn(2, 8).astype(np.float32))
        fused = group_norm(x, scale, bias, num_groups=4, act="silu",
                           film_scale=fs, film_shift=fb)
        base = group_norm(x, scale, bias, num_groups=4)
        manual = base * (1 + fs[:, None, None, :]) + fb[:, None, None, :]
        manual = manual * jax.nn.sigmoid(manual)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(manual), rtol=1e-5, atol=1e-6)

    def test_bf16_input_fp32_stats(self):
        x = jnp.asarray(np.random.RandomState(6).randn(1, 4, 4, 32), jnp.bfloat16)
        out = group_norm(x, jnp.ones(32), jnp.zeros(32))
        assert out.dtype == jnp.bfloat16


class TestResizeGolden:
    def test_bilinear_downscale_matches_torch(self):
        """SpatialRescaler's 0.5x bilinear must match torch F.interpolate."""
        import torch

        x = np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32)
        ours = jax.image.resize(jnp.asarray(x), (1, 4, 4, 3), "bilinear", antialias=False)
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.nn.functional.interpolate(tx, scale_factor=0.5, mode="bilinear")
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    def test_nearest_upsample_matches_torch(self):
        import torch

        from bbdm_tpu.models.layers import upsample_nearest_2x

        x = np.random.RandomState(1).rand(1, 4, 4, 3).astype(np.float32)
        ours = upsample_nearest_2x(jnp.asarray(x))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.nn.functional.interpolate(tx, scale_factor=2, mode="nearest")
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6, atol=1e-7)

    def test_conv_matches_torch(self):
        """NHWC lax conv with HWIO weights == torch NCHW Conv2d (OIHW)."""
        import torch

        rs = np.random.RandomState(2)
        x = rs.randn(2, 8, 8, 4).astype(np.float32)
        w = rs.randn(5, 4, 3, 3).astype(np.float32)  # OIHW
        b = rs.randn(5).astype(np.float32)

        ours = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        tref = torch.nn.functional.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
            torch.from_numpy(b), padding=1,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), tref, rtol=1e-4, atol=1e-4)


class TestGroupNormPallas:
    """Fused Pallas GroupNorm vs the XLA formulation (interpret mode on CPU)."""

    def _compare(self, act=None, film=False, dtype=jnp.float32, C=128, hw=(8, 8)):
        import numpy as np

        from bbdm_tpu.ops.group_norm import _group_norm_xla
        from bbdm_tpu.ops.group_norm_pallas import group_norm_pallas

        rs = np.random.RandomState(0)
        N, G = 2, 32
        x = jnp.asarray(rs.randn(N, *hw, C), dtype)
        scale = jnp.asarray(rs.randn(C), jnp.float32)
        bias = jnp.asarray(rs.randn(C), jnp.float32)
        fs = jnp.asarray(rs.randn(N, C) * 0.1, jnp.float32) if film else None
        fb = jnp.asarray(rs.randn(N, C) * 0.1, jnp.float32) if film else None

        ref = _group_norm_xla(x, scale, bias, num_groups=G, act=act,
                              film_scale=fs, film_shift=fb)
        out = group_norm_pallas(x, scale, bias, fs, fb, G, 1e-5, act)
        assert out.dtype == x.dtype
        tol = 1e-5 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(np.asarray(out, jnp.float32),
                                   np.asarray(ref, jnp.float32),
                                   atol=tol, rtol=tol)

    def test_plain(self):
        self._compare()

    def test_silu(self):
        self._compare(act="silu")

    def test_film_silu(self):
        self._compare(act="silu", film=True)

    def test_bf16(self):
        self._compare(act="silu", film=True, dtype=jnp.bfloat16)

    def test_wide_channels_multi_chunk(self):
        self._compare(act="silu", C=256, hw=(32, 32))

    def test_eligibility(self):
        from bbdm_tpu.ops.group_norm_pallas import eligible

        assert eligible((8, 64, 64, 512), 32, jnp.bfloat16)
        assert not eligible((8, 64, 64, 96), 32, jnp.bfloat16)  # C % 128
        assert eligible((8, 256, 256, 128), 32, jnp.bfloat16)  # tiled: any hw
        assert not eligible((8, 32), 32, jnp.bfloat16)  # no spatial

    def test_grad_falls_back_to_xla(self):
        import numpy as np

        from bbdm_tpu.ops.group_norm import _group_norm_xla
        from bbdm_tpu.ops.group_norm_pallas import group_norm_pallas

        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randn(2, 8, 8, 128), jnp.float32)
        scale = jnp.ones((128,), jnp.float32)
        bias = jnp.zeros((128,), jnp.float32)

        g1 = jax.grad(lambda x: (group_norm_pallas(
            x, scale, bias, None, None, 32, 1e-5, "silu") ** 2).sum())(x)
        g2 = jax.grad(lambda x: (_group_norm_xla(
            x, scale, bias, num_groups=32, act="silu") ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-4, rtol=1e-4)


class TestUpsampleConv:
    """Fused nearest-2x-upsample + conv3x3 (ops/upsample_conv.py) must equal
    the naive path exactly (fp32) — it replaces the reference's
    conv3x3(nearest_upsample_2x(x)) in ResBlock-up / Upsample / VQUpsample."""

    def _naive(self, x, w, b):
        from bbdm_tpu.models.layers import upsample_nearest_2x

        up = upsample_nearest_2x(x)
        out = jax.lax.conv_general_dilated(
            up, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + b

    @pytest.mark.parametrize("shape", [(2, 8, 8, 16, 24), (1, 5, 7, 8, 8),
                                       (3, 16, 16, 32, 32), (1, 1, 1, 4, 4)])
    def test_matches_naive_fp32(self, shape):
        import numpy as np

        from bbdm_tpu.ops.upsample_conv import upsample2x_conv3x3

        N, H, W, ci, co = shape
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(N, H, W, ci), jnp.float32)
        w = jnp.asarray(rs.randn(3, 3, ci, co) * 0.1, jnp.float32)
        b = jnp.asarray(rs.randn(co), jnp.float32)
        ref = self._naive(x, w, b)
        got = upsample2x_conv3x3(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_gradients_match(self):
        import numpy as np

        from bbdm_tpu.ops.upsample_conv import upsample2x_conv3x3

        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randn(2, 6, 6, 8), jnp.float32)
        w = jnp.asarray(rs.randn(3, 3, 8, 8) * 0.1, jnp.float32)
        b = jnp.zeros((8,), jnp.float32)
        g1 = jax.grad(lambda w: (upsample2x_conv3x3(x, w, b) ** 2).sum())(w)
        g2 = jax.grad(lambda w: (self._naive(x, w, b) ** 2).sum())(w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-3, rtol=1e-4)

    def test_pallas_kernel_matches_naive(self):
        """Interpret-mode parity for the Pallas interleaved-write kernel
        (ops/subpixel_pallas.py) incl. the eligibility fallback path."""
        import numpy as np

        from bbdm_tpu.ops.subpixel_pallas import (arrange_phase_kernel,
                                                  subpixel_upconv_pallas)
        from bbdm_tpu.ops.upsample_conv import combine_kernel_2x2

        rs = np.random.RandomState(2)
        for (N, h, w, ci, co) in [(2, 8, 8, 128, 128), (1, 4, 8, 128, 256)]:
            x = jnp.asarray(rs.randn(N, h, w, ci), jnp.float32)
            wk = jnp.asarray(rs.randn(3, 3, ci, co) * 0.05, jnp.float32)
            b = jnp.asarray(rs.randn(co), jnp.float32)
            ref = self._naive(x, wk, b)
            kp = arrange_phase_kernel(combine_kernel_2x2(wk))
            got = subpixel_upconv_pallas(x, kp, b)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=5e-5, rtol=1e-4)

    def test_five_dim_combined_dispatch(self):
        """upsample2x_conv3x3 with a 5-D pre-arranged kernel routes to the
        Pallas path when eligible and falls back to XLA otherwise."""
        import numpy as np

        from bbdm_tpu.ops.subpixel_pallas import arrange_phase_kernel
        from bbdm_tpu.ops.upsample_conv import (combine_kernel_2x2,
                                                upsample2x_conv3x3)

        rs = np.random.RandomState(3)
        # ineligible (ci=16 not lane-aligned) -> falls back to XLA lowering
        x = jnp.asarray(rs.randn(2, 8, 8, 16), jnp.float32)
        wk = jnp.asarray(rs.randn(3, 3, 16, 16) * 0.1, jnp.float32)
        b = jnp.asarray(rs.randn(16), jnp.float32)
        kp = arrange_phase_kernel(combine_kernel_2x2(wk))
        ref = self._naive(x, wk, b)
        got = upsample2x_conv3x3(x, wk, b, combined=kp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        # eligible -> Pallas (interpret on CPU)
        x = jnp.asarray(rs.randn(1, 8, 8, 128), jnp.float32)
        wk = jnp.asarray(rs.randn(3, 3, 128, 128) * 0.1, jnp.float32)
        b = jnp.asarray(rs.randn(128), jnp.float32)
        kp = arrange_phase_kernel(combine_kernel_2x2(wk))
        ref = self._naive(x, wk, b)
        got = upsample2x_conv3x3(x, wk, b, combined=kp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)
        # co=640: 128-aligned but NOT divisible by the 512 co-chunk — must
        # take the XLA fallback, not hit the kernel's chunking assert
        x = jnp.asarray(rs.randn(1, 8, 8, 128), jnp.float32)
        wk = jnp.asarray(rs.randn(3, 3, 128, 640) * 0.1, jnp.float32)
        b = jnp.asarray(rs.randn(640), jnp.float32)
        kp = arrange_phase_kernel(combine_kernel_2x2(wk))
        ref = self._naive(x, wk, b)
        got = upsample2x_conv3x3(x, wk, b, combined=kp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)
