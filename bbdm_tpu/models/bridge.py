"""Brownian Bridge Diffusion Model (pixel space), TPU-native.

Functional re-design of the reference `model/BrownianBridge/BrownianBridgeModel.py`:
the model object holds static configuration + precomputed schedule arrays and a
flax UNet definition; every method is a pure function of (params, rng, data) so
the runner can jit/shard them. The reverse sampler is a single `lax.scan` over
stacked per-step coefficients — one compiled program for all 200 steps instead
of 200 Python-loop dispatches (reference `:203-221`).

Objectives (reference `:128-146`):
    grad  : objective = m_t (y - x0) + sigma_t eps ; x0_hat = x_t - pred
    noise : objective = eps           ; x0_hat = (x_t - m_t y - sigma_t pred)/(1-m_t)
    ysubx : objective = y - x0        ; x0_hat = y - pred
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bbdm_tpu.models.schedules import (
    BridgeSchedule,
    SamplerCoeffs,
    make_bridge_schedule,
    make_sampler_coeffs,
    make_sampling_steps,
)
from bbdm_tpu.models.unet import UNet


def _bcast(a: jax.Array, ndim: int) -> jax.Array:
    """Broadcast a per-example scalar [B] over trailing image dims (reference
    `model/utils.py:4-11` extract)."""
    return a.reshape(a.shape + (1,) * (ndim - 1))


class BrownianBridgeModel:
    """Pixel-space BBDM. ``model_config`` is the YAML ``model:`` subtree."""

    def __init__(self, model_config, *, dtype=jnp.bfloat16):
        self.model_config = model_config
        bb = model_config.BB.params
        self.num_timesteps = bb.num_timesteps
        self.mt_type = bb.mt_type
        self.max_var = bb.get("max_var", 1.0)
        self.eta = bb.get("eta", 1.0)
        self.skip_sample = bb.skip_sample
        self.sample_type = bb.sample_type
        self.sample_step = bb.sample_step
        self.loss_type = bb.loss_type
        self.objective = bb.objective
        # extension knob (no reference equivalent): 'euler' is the reference
        # posterior step; 'heun' adds a second-order corrector (two UNet
        # evals/step) for few-step sampling — see _p_sample_scan_heun
        self.sampler = bb.get("sampler", "euler")
        if self.sampler not in ("euler", "heun"):
            raise NotImplementedError(f"sampler {self.sampler!r}")
        self.condition_key = bb.UNetParams.condition_key
        self.image_size = bb.UNetParams.image_size
        self.channels = bb.UNetParams.out_channels
        self.dtype = dtype

        self.schedule: BridgeSchedule = make_bridge_schedule(
            self.num_timesteps, self.mt_type, self.max_var
        )
        self.steps: np.ndarray = make_sampling_steps(
            self.num_timesteps, self.skip_sample, self.sample_type, self.sample_step
        )
        self.coeffs: SamplerCoeffs = make_sampler_coeffs(
            self.num_timesteps, self.mt_type, self.max_var, self.steps, self.eta
        )

        init_scheme = model_config.get("init_scheme", "reference")
        self.unet = UNet.from_config(
            bb.UNetParams, condition_key=self.condition_key,
            dtype=dtype, init_scheme=init_scheme,
        )

    # ---------------------------------------------------------------- params

    def _unet_init_args(self):
        H = self.image_size
        x = jnp.zeros((1, H, H, self.channels), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        ctx = None
        if self.condition_key != "nocond":
            ctx_ch = self.unet.in_channels - self.channels
            ctx = jnp.zeros((1, H, H, ctx_ch), jnp.float32)
        return x, t, ctx

    def init_params(self, rng) -> dict:
        x, t, ctx = self._unet_init_args()
        variables = self.unet.init(rng, x, t, ctx)
        return {"unet": variables["params"]}

    def _subpixel_structure(self):
        """Shape-only tree of the UNet's "subpixel" collection (the paths of
        the UpsampleConv3x3 pre-combined kernels), discovered abstractly."""
        if not hasattr(self, "_subpixel_struct"):
            x, t, ctx = self._unet_init_args()
            shapes = jax.eval_shape(self.unet.init, jax.random.PRNGKey(0), x, t, ctx)
            self._subpixel_struct = shapes.get("subpixel")
        return self._subpixel_struct

    def _subpixel_collection(self, unet_params):
        """Precompute every UpsampleConv3x3 phase-combined kernel from the 3x3
        params (fp32 combine). Returns the "subpixel" collection tree or None.

        With BBDM_PALLAS_SUBPIX=1 on TPU the kernels are additionally
        rearranged to the [4,2,2,ci,co] per-phase layout consumed by the
        Pallas interleaved-write kernel (ops/subpixel_pallas.py); the
        5-D shape is what opts the conv into that path."""
        import os

        from bbdm_tpu.ops.subpixel_pallas import arrange_phase_kernel
        from bbdm_tpu.ops.upsample_conv import combine_kernel_2x2

        struct = self._subpixel_structure()
        if not struct:
            return None
        use_pallas = (os.environ.get("BBDM_PALLAS_SUBPIX") == "1"
                      and jax.default_backend() == "tpu")

        def leaf(kernel):
            k2 = combine_kernel_2x2(kernel)
            ci, co = kernel.shape[2], kernel.shape[3]
            if use_pallas and ci % 128 == 0 and co % 128 == 0:
                return arrange_phase_kernel(k2)
            return k2

        def build(s_node, p_node):
            return {
                k: leaf(p_node["kernel"]) if k == "kernel2"
                else build(v, p_node[k])
                for k, v in s_node.items()
            }

        return build(struct, unet_params)

    def trainable_mask(self, params) -> dict:
        """Pytree mask of trainable leaves (everything, for pixel BBDM)."""
        return jax.tree_util.tree_map(lambda _: True, params)

    # ----------------------------------------------------------------- math

    def denoise(self, params, x_t, t, context, *, train=False, rngs=None):
        variables = {"params": params["unet"]}
        if "unet_subpixel" in params:  # hoisted combine (p_sample_loop)
            variables["subpixel"] = params["unet_subpixel"]
        return self.unet.apply(variables, x_t, t, context, train=train, rngs=rngs)

    def q_sample(self, x0, y, t, noise):
        """Forward bridge draw + training objective (reference `:128-146`)."""
        m_t = _bcast(jnp.asarray(self.schedule.m_t)[t], x0.ndim)
        var_t = _bcast(jnp.asarray(self.schedule.variance_t)[t], x0.ndim)
        sigma_t = jnp.sqrt(var_t)
        x_t = (1.0 - m_t) * x0 + m_t * y + sigma_t * noise
        if self.objective == "grad":
            objective = m_t * (y - x0) + sigma_t * noise
        elif self.objective == "noise":
            objective = noise
        elif self.objective == "ysubx":
            objective = y - x0
        else:
            raise NotImplementedError(self.objective)
        return x_t, objective

    def predict_x0_from_objective(self, x_t, y, pred, *, m_t, sigma_t):
        """Invert the objective to x0_hat (reference `:148-160`).

        m_t/sigma_t: per-example broadcastable arrays for the current step.
        """
        if self.objective == "grad":
            return x_t - pred
        if self.objective == "noise":
            return (x_t - m_t * y - sigma_t * pred) / (1.0 - m_t)
        if self.objective == "ysubx":
            return y - pred
        raise NotImplementedError(self.objective)

    # ----------------------------------------------------------------- loss

    def loss(self, params, rng, x, y, context=None):
        """Training loss (reference forward + p_losses `:88-126`).

        Returns (loss, aux) where aux carries x0_recon for logging.
        """
        if self.condition_key == "nocond":
            context = None
        elif context is None:
            context = y
        B = x.shape[0]
        t_rng, n_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (B,), 0, self.num_timesteps)
        noise = jax.random.normal(n_rng, x.shape, x.dtype)

        x_t, objective = self.q_sample(x, y, t, noise)
        # train=True: dropout engages (the reference net stays in train mode
        # for the loss, `runners/BaseRunner.py:398-417`) and UpsampleConv3x3
        # keeps the naive lowering (the per-step kernel combine is not
        # hoistable under changing weights — BENCH_NOTES.md round 2).
        rngs = None
        if self.unet.dropout > 0.0:
            rngs = {"dropout": jax.random.fold_in(rng, 0x64726F70)}
        pred = self.denoise(
            params, x_t, t, context, train=True, rngs=rngs
        ).astype(x.dtype)

        if self.loss_type == "l1":
            recloss = jnp.abs(objective - pred).mean()
        elif self.loss_type == "l2":
            recloss = jnp.mean((objective - pred) ** 2)
        else:
            raise NotImplementedError(self.loss_type)

        m_t = _bcast(jnp.asarray(self.schedule.m_t)[t], x.ndim)
        sigma_t = jnp.sqrt(_bcast(jnp.asarray(self.schedule.variance_t)[t], x.ndim))
        x0_recon = self.predict_x0_from_objective(x_t, y, pred, m_t=m_t, sigma_t=sigma_t)
        return recloss, {"loss": recloss, "x0_recon": x0_recon}

    # -------------------------------------------------------------- sampling

    def q_sample_loop(self, rng, x0, y):
        """Forward-bridge trajectory for visualization (reference `:162-169`)."""
        T = self.num_timesteps

        def body(carry_rng, t):
            rng, step_rng = jax.random.split(carry_rng)
            noise = jax.random.normal(step_rng, x0.shape, x0.dtype)
            x_t, _ = self.q_sample(x0, y, jnp.full((x0.shape[0],), t), noise)
            return rng, x_t

        _, imgs = jax.lax.scan(body, rng, jnp.arange(T))
        return imgs

    def p_sample_loop(self, params, rng, y, context=None, *, clip_denoised=True,
                      sample_mid_step=False):
        """Reverse skip-step sampler as one `lax.scan` (reference `:171-221`).

        The bridge starts from the conditioning latent itself (x_T := y,
        reference `:218`) — no Gaussian prior draw.
        """
        if self.condition_key == "nocond":
            context = None
        elif context is None:
            context = y

        # Hoist the UpsampleConv3x3 phase-kernel combine out of the scan:
        # computed here once (fp32) instead of per step inside the loop.
        # (tests may stub `denoise` with empty params — skip the hoist then)
        sub = self._subpixel_collection(params["unet"]) if "unet" in params else None
        if sub is not None:
            params = dict(params, unet_subpixel=sub)

        # Pre-cast matmul/conv kernels to the compute dtype once, outside the
        # scan: flax casts params at use (per step), which reads the fp32
        # copies from HBM 200 times. 1-D params (GroupNorm scale/bias, conv
        # biases) stay fp32 — GroupNorm statistics keep their fp32 contract.
        if self.dtype != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(self.dtype)
                if (p.dtype == jnp.float32 and p.ndim >= 2) else p,
                params,
            )

        if self.sampler == "heun":
            return self._p_sample_scan_heun(
                params, rng, y, context,
                clip_denoised=clip_denoised, sample_mid_step=sample_mid_step,
            )

        c = self.coeffs
        xs = {
            "t": jnp.asarray(c.steps),
            "a_xt": jnp.asarray(c.a_xt),
            "a_x0": jnp.asarray(c.a_x0),
            "a_y": jnp.asarray(c.a_y),
            "sigma": jnp.asarray(c.sigma),
            "m_t": jnp.asarray(c.m_t),
            "sigma_fwd": jnp.asarray(c.sigma_fwd),
        }
        B = y.shape[0]

        def body(carry, step):
            x_t, rng = carry
            rng, step_rng = jax.random.split(rng)
            t = jnp.full((B,), step["t"], jnp.int32)
            pred = self.denoise(params, x_t, t, context).astype(y.dtype)
            x0_hat = self.predict_x0_from_objective(
                x_t, y, pred, m_t=step["m_t"], sigma_t=step["sigma_fwd"]
            )
            if clip_denoised:
                x0_hat = jnp.clip(x0_hat, -1.0, 1.0)
            noise = jax.random.normal(step_rng, x_t.shape, x_t.dtype)
            x_next = (
                step["a_xt"] * x_t + step["a_x0"] * x0_hat + step["a_y"] * y
                + step["sigma"] * noise
            )
            out = (x_next, x0_hat) if sample_mid_step else None
            return (x_next, rng), out

        (x_final, _), mids = jax.lax.scan(body, (y, rng), xs)
        if sample_mid_step:
            return mids  # (imgs [S,B,H,W,C], one_step_imgs [S,B,H,W,C])
        return x_final

    def _p_sample_scan_heun(self, params, rng, y, context, *, clip_denoised,
                            sample_mid_step):
        """Second-order reverse sampler (extension; no reference equivalent).

        The reference step uses x0_hat(x_t, t) across the whole [t -> nt]
        interval (first-order in the step size). Heun's corrector: take the
        deterministic proposal to nt, re-predict x0 there, and redo the step
        from x_t with the AVERAGE of the two x0 estimates — the update is
        linear in x0_hat, so the corrected step reuses the same precomputed
        coefficients. Noise (eta) is added once, after the corrector. Two UNet
        evals per step: at matched NFE (heun at S/2 vs euler at S) the
        integration error is strictly smaller (tests/test_heun_sampler.py),
        which is what enables few-step sampling.

        The terminal t == 0 entry of the grid just returns x0_hat
        (reference `:174-180`); it runs outside the scan with a single eval.
        """
        import numpy as np  # host-side schedule slicing

        c = self.coeffs
        steps = np.asarray(c.steps)
        m = np.asarray(self.schedule.m_t)
        sig = np.sqrt(np.asarray(self.schedule.variance_t))
        nts = steps[1:]
        xs = {
            "t": jnp.asarray(steps[:-1]),
            "nt": jnp.asarray(nts.astype(np.int32)),
            "a_xt": jnp.asarray(c.a_xt[:-1]),
            "a_x0": jnp.asarray(c.a_x0[:-1]),
            "a_y": jnp.asarray(c.a_y[:-1]),
            "sigma": jnp.asarray(c.sigma[:-1]),
            "m_t": jnp.asarray(c.m_t[:-1]),
            "sigma_fwd": jnp.asarray(c.sigma_fwd[:-1]),
            "m_nt": jnp.asarray(m[nts]),
            "sigma_fwd_nt": jnp.asarray(sig[nts]),
        }
        B = y.shape[0]

        def predict(x, y, t_scalar, m_t, sigma_t):
            t = jnp.full((B,), t_scalar, jnp.int32)
            pred = self.denoise(params, x, t, context).astype(y.dtype)
            x0 = self.predict_x0_from_objective(x, y, pred, m_t=m_t, sigma_t=sigma_t)
            return jnp.clip(x0, -1.0, 1.0) if clip_denoised else x0

        def body(carry, step):
            x_t, rng = carry
            rng, step_rng = jax.random.split(rng)
            x0_a = predict(x_t, y, step["t"], step["m_t"], step["sigma_fwd"])
            proposal = step["a_xt"] * x_t + step["a_x0"] * x0_a + step["a_y"] * y
            x0_b = predict(proposal, y, step["nt"], step["m_nt"], step["sigma_fwd_nt"])
            x0_eff = 0.5 * (x0_a + x0_b)
            noise = jax.random.normal(step_rng, x_t.shape, x_t.dtype)
            x_next = (
                step["a_xt"] * x_t + step["a_x0"] * x0_eff + step["a_y"] * y
                + step["sigma"] * noise
            )
            out = (x_next, x0_eff) if sample_mid_step else None
            return (x_next, rng), out

        (x_last, _), mids = jax.lax.scan(body, (y, rng), xs)
        # terminal grid entry (t == 0): return x0_hat
        x_final = predict(x_last, y, steps[-1], float(m[steps[-1]]),
                          float(sig[steps[-1]]))
        if sample_mid_step:
            tail = lambda seq: jnp.concatenate([seq, x_final[None]], axis=0)
            return tail(mids[0]), tail(mids[1])  # same [S,...] contract as euler
        return x_final

    def sample(self, params, rng, y, context=None, *, clip_denoised=True,
               sample_mid_step=False, num_samples=1):
        """reference `:223-225`. ``num_samples > 1`` stacks several draws for
        the same conditions in one compiled call (scan over split rngs) —
        see LatentBrownianBridgeModel.sample."""
        if num_samples > 1:
            if sample_mid_step:
                raise NotImplementedError("num_samples>1 with sample_mid_step")

            def body(carry, r):
                return carry, self.p_sample_loop(params, r, y, context,
                                                 clip_denoised=clip_denoised)

            _, outs = jax.lax.scan(body, None, jax.random.split(rng, num_samples))
            return outs
        return self.p_sample_loop(
            params, rng, y, context,
            clip_denoised=clip_denoised, sample_mid_step=sample_mid_step,
        )
