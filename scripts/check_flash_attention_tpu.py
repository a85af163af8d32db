"""On-hardware parity check: Pallas flash attention vs the XLA path
(VERDICT r1 Weak #7 — round 1 only ever tested the kernel in interpret mode).

Runs both attention implementations on the real device at the shapes that
engage the Pallas path in production — the frozen VQGAN's 64^2 AttnBlock
(T=4096, d=512, single head; reference `model/VQGAN/model.py:140-192`) — plus
a multi-head long-sequence shape, in bf16 and fp32, and prints the max abs /
relative differences. Record the numbers in BENCH_NOTES.md.

Run on the TPU host: python scripts/check_flash_attention_tpu.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bbdm_tpu.ops.attention import _xla_attention
from bbdm_tpu.ops.flash_attention import flash_attention


def check(shape, dtype, seed):
    B, H, T, D = shape
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(kq, shape, jnp.float32).astype(dtype)
    k = jax.random.normal(kk, shape, jnp.float32).astype(dtype)
    v = jax.random.normal(kv, shape, jnp.float32).astype(dtype)

    flash = jax.jit(lambda a, b, c: flash_attention(a, b, c))
    xla = jax.jit(_xla_attention)
    o_f = np.asarray(flash(q, k, v), np.float32)
    o_x = np.asarray(xla(q, k, v), np.float32)
    # sync through values (block_until_ready unreliable under axon)
    ad = np.abs(o_f - o_x)
    scale = np.abs(o_x).max()
    return {
        "shape": list(shape), "dtype": str(dtype.__name__),
        "max_abs_diff": float(ad.max()),
        "max_rel_diff": float(ad.max() / max(scale, 1e-9)),
        "mean_abs_diff": float(ad.mean()),
    }


def main():
    results = {
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "cases": [
            check((1, 1, 4096, 512), jnp.bfloat16, 0),   # VQGAN AttnBlock
            check((1, 1, 4096, 512), jnp.float32, 1),
            check((2, 8, 1024, 128), jnp.bfloat16, 2),   # multi-head long-seq
        ],
    }
    print(json.dumps(results, indent=2))
    for c in results["cases"]:
        # fp32 tolerance is 1e-3, not 1e-7: on TPU the XLA einsum path runs
        # f32 matmuls as bf16-pass decompositions at DEFAULT precision, so the
        # two implementations legitimately differ at ~3e-4 max
        assert c["max_abs_diff"] < (1e-2 if "bfloat16" in c["dtype"] else 1e-3), c
    print("PARITY OK")


if __name__ == "__main__":
    main()
