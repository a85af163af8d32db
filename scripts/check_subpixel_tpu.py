"""On-TPU parity check: Pallas subpixel upsample-conv vs the XLA lowering.

Real Mosaic compile (not interpret mode) at the production UNet shapes.
Microbench timing through the axon tunnel is dispatch-bound, so this only
checks numerics; speed is judged by the full 200-step bench with
BBDM_PALLAS_SUBPIX=1.

    python scripts/check_subpixel_tpu.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bbdm_tpu.ops.subpixel_pallas import arrange_phase_kernel, subpixel_upconv_pallas
from bbdm_tpu.ops.upsample_conv import combine_kernel_2x2, upsample2x_conv3x3


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rs = np.random.RandomState(0)
    # the two UNet up-ResBlock in_conv shapes + a VQGAN-decoder-like shape
    for (N, h, w, ci, co), dt in [
        ((8, 16, 16, 1024, 1024), jnp.bfloat16),
        ((8, 32, 32, 512, 512), jnp.bfloat16),
        ((8, 16, 16, 1024, 1024), jnp.float32),
        ((1, 64, 64, 512, 512), jnp.bfloat16),
    ]:
        x = jnp.asarray(rs.randn(N, h, w, ci), jnp.float32).astype(dt)
        wk = jnp.asarray(rs.randn(3, 3, ci, co) * 0.02, jnp.float32)
        b = jnp.asarray(rs.randn(co) * 0.1, jnp.float32)
        # combine on the dtype-cast weights so both paths consume IDENTICAL
        # phase kernels (the XLA reference combines after the cast too);
        # residual diff is then accumulation order only
        k2 = combine_kernel_2x2(wk.astype(dt))
        kp = arrange_phase_kernel(k2)

        ref = jax.jit(lambda x: upsample2x_conv3x3(x, wk.astype(dt), b))(x)
        got = jax.jit(lambda x: subpixel_upconv_pallas(x, kp, b))(x)
        d = jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))
        md, mn = float(d.max()), float(d.mean())
        amax = float(jnp.abs(ref.astype(jnp.float32)).max())
        print(f"[{N},{h},{w},{ci}->{co}] {dt.__name__}: "
              f"max {md:.2e} mean {mn:.2e} (|ref|max {amax:.1f})", flush=True)
        if dt == jnp.bfloat16:
            # both sides accumulate in f32 and round ONCE to bf16; sums that
            # land near a rounding boundary flip by 1 ulp (= 2^-8 * |y|).
            assert md <= 2.0 ** -7 * max(amax, 1.0), (md, amax)
            assert mn <= 5e-3, mn
        else:
            assert md <= 1e-4, md
    print("SUBPIXEL PALLAS TPU PARITY OK")


if __name__ == "__main__":
    main()
