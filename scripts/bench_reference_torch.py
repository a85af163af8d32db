"""Measure the actual PyTorch reference (VERDICT r1 Missing #3).

BASELINE.md's plan is self-measured parity, but round 1 only ever *estimated*
the torch side. This script measures it, on the only hardware both stacks can
share here (this host's CPU):

1. **Flagship UNet forward** (LBBDM-f4 UNetParams, 64^2 latent, batch 1):
   wall time per forward for the reference torch UNetModel
   (`/root/reference/model/BrownianBridge/base/modules/diffusionmodules/
   openaimodel.py:446-759`) vs our jitted flax UNet — same config, same
   machine, fp32. This anchors the "well-fed torch UNet" efficiency number
   that bench.py's A100 estimate assumes, with a measured datapoint.
2. **Per-step dispatch overhead** (tiny UNet, 8^2, batch 2): per-forward wall
   for both stacks at a size where Python/dispatch overhead dominates compute
   — the cost the reference pays 200x per sampled image through its Python
   step loop (`BrownianBridgeModel.py:203-221`) and our lax.scan amortizes.

Prints one JSON line; paste the numbers into BASELINE.md.

Run: JAX_PLATFORM_NAME=cpu python scripts/bench_reference_torch.py
(force-CPU is handled internally; safe to run alongside TPU jobs.)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores env vars

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402


def _load_reference_unet_class():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "omegaconf" not in sys.modules:
        import types

        omegaconf = types.ModuleType("omegaconf")
        listconfig = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        listconfig.ListConfig = ListConfig
        omegaconf.listconfig = listconfig
        sys.modules["omegaconf"] = omegaconf
        sys.modules["omegaconf.listconfig"] = listconfig
    from model.BrownianBridge.base.modules.diffusionmodules.openaimodel import (
        UNetModel,
    )

    return UNetModel


def _time_torch(net, args, warmup=1, runs=3):
    with torch.no_grad():
        for _ in range(warmup):
            net(*args)
        t0 = time.perf_counter()
        for _ in range(runs):
            net(*args)
        return (time.perf_counter() - t0) / runs


def _time_jax(fn, args, warmup=1, runs=3):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(runs):
        float(fn(*args))
    return (time.perf_counter() - t0) / runs


def bench_pair(unet_kwargs, batch, size, in_ch, runs, tag):
    """Time one reference-torch and one flax forward at the same config."""
    from bbdm_tpu.config import dict2namespace
    from bbdm_tpu.models.unet import UNet

    UNetModel = _load_reference_unet_class()
    torch.manual_seed(0)
    tnet = UNetModel(**unet_kwargs)
    tnet.eval()

    x_t = torch.randn(batch, in_ch, size, size)
    ts_t = torch.zeros(batch, dtype=torch.long)
    t_torch = _time_torch(tnet, (x_t, ts_t), runs=runs)

    p = dict2namespace({**unet_kwargs, "attention_resolutions":
                        tuple(unet_kwargs["attention_resolutions"]),
                        "channel_mult": tuple(unet_kwargs["channel_mult"])})
    jnet = UNet.from_config(p, condition_key="nocond", dtype=jnp.float32)
    xj = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    tsj = jnp.zeros((batch,), jnp.int32)
    params = jax.jit(jnet.init)({"params": jax.random.PRNGKey(0)}, xj, tsj)["params"]
    fwd = jax.jit(lambda pr, x, t: jnet.apply({"params": pr}, x, t).mean())
    t_jax = _time_jax(fwd, (params, xj, tsj), runs=runs)

    n_params = sum(q.numel() for q in tnet.parameters())
    print(f"[{tag}] torch {t_torch*1e3:.1f} ms/fwd | jax(cpu) {t_jax*1e3:.1f} "
          f"ms/fwd | {n_params/1e6:.1f}M params", file=sys.stderr)
    return t_torch, t_jax, n_params


def bench_train_pair(unet_kwargs, batch, size, in_ch, runs, tag):
    """Time one FULL train step (l1-loss forward + backward + Adam update)
    on the reference torch UNet vs our jitted flax UNet + optax — the
    reference's hot loop minus the frozen-VQGAN encode
    (`/root/reference/runners/BaseRunner.py:398-423`: loss.backward(),
    optimizer.step(); EMA rides a cadence and is excluded on both sides)."""
    from bbdm_tpu.config import dict2namespace
    from bbdm_tpu.models.unet import UNet

    UNetModel = _load_reference_unet_class()
    torch.manual_seed(0)
    tnet = UNetModel(**unet_kwargs)
    tnet.train()
    opt = torch.optim.Adam(tnet.parameters(), lr=1e-4)

    x_t = torch.randn(batch, in_ch, size, size)
    tgt_t = torch.randn(batch, in_ch, size, size)
    ts_t = torch.zeros(batch, dtype=torch.long)

    def torch_step():
        opt.zero_grad(set_to_none=True)
        loss = (tnet(x_t, ts_t) - tgt_t).abs().mean()
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(1):
        torch_step()
    t0 = time.perf_counter()
    for _ in range(runs):
        torch_step()
    t_torch = (time.perf_counter() - t0) / runs

    import optax

    p = dict2namespace({**unet_kwargs, "attention_resolutions":
                        tuple(unet_kwargs["attention_resolutions"]),
                        "channel_mult": tuple(unet_kwargs["channel_mult"])})
    jnet = UNet.from_config(p, condition_key="nocond", dtype=jnp.float32)
    xj = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    tgtj = jnp.asarray(tgt_t.numpy().transpose(0, 2, 3, 1))
    tsj = jnp.zeros((batch,), jnp.int32)
    params = jax.jit(jnet.init)({"params": jax.random.PRNGKey(0)}, xj, tsj)["params"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def jax_step(params, opt_state, x, t, tgt):
        def loss_fn(pr):
            return jnp.abs(jnet.apply({"params": pr}, x, t) - tgt).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = jax_step(params, opt_state, xj, tsj, tgtj)
    float(loss)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(runs):
        params, opt_state, loss = jax_step(params, opt_state, xj, tsj, tgtj)
        float(loss)
    t_jax = (time.perf_counter() - t0) / runs

    print(f"[{tag}] torch {t_torch*1e3:.1f} ms/step | jax(cpu) "
          f"{t_jax*1e3:.1f} ms/step", file=sys.stderr)
    return t_torch, t_jax


def main():
    torch.set_num_threads(os.cpu_count() or 1)

    flagship = dict(
        image_size=64, in_channels=3, model_channels=128, out_channels=3,
        num_res_blocks=2, attention_resolutions=(32, 16, 8),
        channel_mult=(1, 4, 8), conv_resample=True, dims=2, num_heads=8,
        num_head_channels=64, use_scale_shift_norm=True, resblock_updown=True,
        use_spatial_transformer=False, condition_key="nocond",
    )
    t_torch_big, t_jax_big, n_params = bench_pair(
        flagship, batch=1, size=64, in_ch=3, runs=2, tag="flagship-64x64")

    tiny = dict(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        conv_resample=True, dims=2, num_heads=4, num_head_channels=8,
        use_scale_shift_norm=True, resblock_updown=True,
        use_spatial_transformer=False, condition_key="nocond",
    )
    t_torch_tiny, t_jax_tiny, _ = bench_pair(
        tiny, batch=2, size=8, in_ch=3, runs=10, tag="tiny-8x8")

    t_torch_train, t_jax_train = bench_train_pair(
        flagship, batch=1, size=64, in_ch=3, runs=2, tag="flagship-train-step")

    from bbdm_tpu.utils.flops import unet_forward_flops
    from bbdm_tpu.config import dict2namespace

    fl = unet_forward_flops(dict2namespace({**flagship,
        "attention_resolutions": (32, 16, 8), "channel_mult": (1, 4, 8)}))
    fl_train = 3.0 * fl  # fwd + bwd (~2x fwd), optimizer excluded both sides

    print(json.dumps({
        "metric": "reference torch vs bbdm_tpu, same-host CPU fp32",
        "flagship_unet": {
            "params_M": round(n_params / 1e6, 1),
            "flops_per_forward_G": round(fl / 1e9, 1),
            "torch_ms_per_forward": round(t_torch_big * 1e3, 1),
            "jax_cpu_ms_per_forward": round(t_jax_big * 1e3, 1),
            "torch_achieved_gflops": round(fl / t_torch_big / 1e9, 2),
            "jax_cpu_achieved_gflops": round(fl / t_jax_big / 1e9, 2),
            "jax_over_torch_speedup": round(t_torch_big / t_jax_big, 3),
        },
        "tiny_unet_dispatch": {
            "torch_ms_per_forward": round(t_torch_tiny * 1e3, 2),
            "jax_cpu_ms_per_forward": round(t_jax_tiny * 1e3, 2),
        },
        "flagship_train_step": {
            "what": "l1 fwd + backward + Adam, batch 1, 64x64 latent",
            "flops_per_step_G": round(fl_train / 1e9, 1),
            "torch_ms_per_step": round(t_torch_train * 1e3, 1),
            "jax_cpu_ms_per_step": round(t_jax_train * 1e3, 1),
            "torch_achieved_gflops": round(fl_train / t_torch_train / 1e9, 2),
            "jax_cpu_achieved_gflops": round(fl_train / t_jax_train / 1e9, 2),
            "jax_over_torch_speedup": round(t_torch_train / t_jax_train, 3),
        },
    }))


if __name__ == "__main__":
    main()
