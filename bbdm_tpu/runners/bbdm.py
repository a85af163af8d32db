"""BBDMRunner: Brownian-bridge-specific runner
(reference `runners/DiffusionBasedModelRunners/BBDMRunner.py:16-253`).

Covers: model construction, optimizer (Adam + ReduceLROnPlateau over UNet
[+ cond stage], VQGAN frozen), parameter-count summary, dataset-wide latent
mean/std pass for ``normalize_latent``, latent stats in checkpoints, 4-grid
mid-training sampling, and the full test-set ``sample_to_eval`` sweep with its
directory contract (condition/, ground_truth/, <sample_step>/[name/output_j.png]).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from bbdm_tpu.checkpoints.io import load_checkpoint
from bbdm_tpu.models import build_model
from bbdm_tpu.models.latent import LatentBrownianBridgeModel, init_latent_stats
from bbdm_tpu.parallel import fetch_tree
from bbdm_tpu.registry import Registers
from bbdm_tpu.runners.diffusion_base import DiffusionBaseRunner
from bbdm_tpu.runners.utils import make_dir
from bbdm_tpu.training.optim import build_optimizer
from bbdm_tpu.utils.images import get_image_grid, save_single_image
from flax import serialization


@Registers.runners.register_with_name("BBDMRunner")
class BBDMRunner(DiffusionBaseRunner):
    def initialize_model(self, config):
        return build_model(config.model)

    @property
    def is_latent(self):
        return isinstance(self.model, LatentBrownianBridgeModel)

    def default_latent_stats(self):
        # populated lazily; identity stats unless normalize_latent computes them
        return None

    def print_model_summary(self, params):
        def count(tree):
            return sum(x.size for x in jax.tree_util.tree_leaves(tree))

        total = count(params)
        mask = self.model.trainable_mask(params)
        trainable = sum(
            leaf.size
            for leaf, m in zip(
                jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(mask)
            )
            if m
        )
        self.logger("Total Number of parameter: %.2fM" % (total / 1e6))
        self.logger("Trainable Number of parameter: %.2fM" % (trainable / 1e6))

    def initialize_optimizer_scheduler(self, params, config):
        optim_cfg = config.model.BB.optimizer
        mask = self.model.trainable_mask(params)
        if config.training.get("fuse_small_leaves", False):
            from bbdm_tpu.training.bucket import SmallLeafBucketer

            self.bucketer = SmallLeafBucketer(
                params, mask,
                threshold=config.training.get("fuse_threshold", 65536))
            mask = self.bucketer.bucket_mask(mask)
        tx = build_optimizer(optim_cfg, trainable_mask=mask)
        return tx, config.model.BB.lr_scheduler, optim_cfg.lr

    def on_params_initialized(self, params):
        """Load the frozen VQGAN first stage from ``VQGAN.params.ckpt_path``
        (reference `model/VQGAN/vqgan.py:63-72` loads it at construction).
        Accepts our .ckpt format or a torch LDM checkpoint (auto-converted).
        """
        if not self.is_latent:
            return params
        path = self.config.model.VQGAN.params.get("ckpt_path")
        if not path:
            return params
        if not os.path.exists(path):
            raise FileNotFoundError(f"VQGAN checkpoint not found: {path}")
        try:
            from bbdm_tpu.checkpoints.io import extract_vqgan_tree

            vq = extract_vqgan_tree(load_checkpoint(path))
        except Exception:
            from bbdm_tpu.checkpoints.torch_import import convert_ldm_vqgan_checkpoint

            vq = convert_ldm_vqgan_checkpoint(path)
        from flax import serialization as _ser

        params["vqgan"] = _ser.from_state_dict(params["vqgan"], vq)
        self.logger(f"load vqgan from {path}")
        return params

    # -------------------------------------------------------- latent stats

    def load_model_from_checkpoint(self):
        """Adds latent-stat handling (reference BBDMRunner.py:31-47)."""
        states = None
        if self.config.model.get("only_load_latent_mean_std", False):
            path = self.config.model.get("model_load_path")
            if path:
                states = load_checkpoint(path)
        else:
            states = super().load_model_from_checkpoint()

        if self.is_latent and self.config.model.get("normalize_latent", False):
            if states is not None and "ori_latent_mean" in states:
                stats = {
                    k: jnp.asarray(states[k])
                    for k in (
                        "ori_latent_mean", "ori_latent_std",
                        "cond_latent_mean", "cond_latent_std",
                    )
                }
                self.state = self.state.replace(latent_stats=stats)
            elif self.config.args.train:
                self.get_latent_mean_std()
        return states

    def get_checkpoint_states(self, stage="epoch_end"):
        model_states, optim_states = super().get_checkpoint_states(stage)
        if self.is_latent and self.config.model.get("normalize_latent", False):
            stats = self.state.latent_stats or init_latent_stats(self.model.channels)
            # fetch_tree: the stats ride the TrainState placement, so under
            # multi-host FSDP they can be cross-process sharded too
            stats = {k: np.asarray(v) for k, v in fetch_tree(stats).items()}
            for k in ("ori_latent_mean", "ori_latent_std",
                      "cond_latent_mean", "cond_latent_std"):
                model_states[k] = stats[k]
        return model_states, optim_states

    def get_latent_mean_std(self):
        """Two-pass dataset-wide latent mean/std (reference BBDMRunner.py:85-162)."""
        from bbdm_tpu.data import DataLoader, get_dataset

        train_ds, _, _ = get_dataset(self.config.data)
        # Every host must end with IDENTICAL stats (the reference encodes the
        # full dataset on every rank — plain DataLoader, no DistributedSampler,
        # BBDMRunner.py:87-91; per-host shard stats would silently normalize
        # each host's latents differently before the gradient all-reduce).
        # Here each host encodes only ITS shard on its local chips and the
        # per-host partial sums are allgathered — same result at 1/P the cost.
        nproc = jax.process_count()
        loader = DataLoader(
            train_ds, self.config.data.train.batch_size,
            shuffle=True, drop_last=True, seed=self.config.args.seed,
            shard_count=nproc, shard_index=jax.process_index(),
        )
        # the two encode passes below re-upload the whole train set twice —
        # under training.device_data_cache they gather from HBM instead
        # (placed on the sampling mesh, where _put_sample_batch shards)
        from bbdm_tpu.data.device_cache import maybe_device_cache

        loader = maybe_device_cache(
            loader, getattr(self, "sample_mesh", self.mesh),
            self.config.training, self.logger)

        def combine(*totals):
            if nproc == 1:
                return totals
            from jax.experimental import multihost_utils

            return tuple(
                multihost_utils.process_allgather(np.asarray(v)).sum(axis=0)
                for v in totals
            )

        @jax.jit
        def encode_pair(params, x, y):
            xl = self.model.encode(params, x, cond=False, normalize=False)
            yl = self.model.encode(params, y, cond=True, normalize=False)
            return xl, yl

        @jax.jit
        def batch_means(params, x, y):
            xl, yl = encode_pair(params, x, y)
            return xl.mean(axis=(0, 1, 2), keepdims=True), yl.mean(axis=(0, 1, 2), keepdims=True)

        @jax.jit
        def batch_vars(params, x, y, ori_mean, cond_mean):
            xl, yl = encode_pair(params, x, y)
            return (
                ((xl - ori_mean) ** 2).mean(axis=(0, 1, 2), keepdims=True),
                ((yl - cond_mean) ** 2).mean(axis=(0, 1, 2), keepdims=True),
            )

        put = self._put_sample_batch  # local-mesh sharding: all local chips
        self.logger("start calculating latent mean")
        tot_om, tot_cm, n = 0.0, 0.0, 0
        for batch in loader:
            om, cm = batch_means(self.state.params, put(batch["x"]), put(batch["x_cond"]))
            tot_om, tot_cm, n = tot_om + om, tot_cm + cm, n + 1
        tot_om, tot_cm, n = combine(tot_om, tot_cm, np.asarray(n, np.int64))
        ori_mean, cond_mean = jnp.asarray(tot_om / n), jnp.asarray(tot_cm / n)

        self.logger("start calculating latent std")
        tot_ov, tot_cv, n = 0.0, 0.0, 0
        for batch in loader:
            ov, cv = batch_vars(self.state.params, put(batch["x"]), put(batch["x_cond"]),
                                ori_mean, cond_mean)
            tot_ov, tot_cv, n = tot_ov + ov, tot_cv + cv, n + 1
        tot_ov, tot_cv, n = combine(tot_ov, tot_cv, np.asarray(n, np.int64))
        stats = {
            "ori_latent_mean": ori_mean,
            "ori_latent_std": jnp.asarray(jnp.sqrt(tot_ov / n)),
            "cond_latent_mean": cond_mean,
            "cond_latent_std": jnp.asarray(jnp.sqrt(tot_cv / n)),
        }
        self.state = self.state.replace(latent_stats=stats)
        for k, v in stats.items():
            self.logger(f"{k}: {np.asarray(v).ravel()}")

    # ------------------------------------------------------------ sampling

    @functools.cached_property
    def _sample_fn(self):
        clip = self.config.testing.get("clip_denoised", False)

        if self.is_latent:
            def fn(params, rng, x_cond, stats):
                return self.model.sample(
                    params, rng, x_cond, clip_denoised=clip, latent_stats=stats
                )
        else:
            def fn(params, rng, x_cond, stats):
                return self.model.sample(params, rng, x_cond, clip_denoised=clip)

        return jax.jit(fn)

    @functools.cached_property
    def _sample_multi_fn(self):
        """One dispatch for all ``testing.sample_num`` draws of a batch:
        condition encode / context / param pre-cast run once (the reference
        re-encodes per draw, BBDMRunner.py:234-239). Returns [n, B, H, W, C]."""
        clip = self.config.testing.get("clip_denoised", False)
        n = self.config.testing.sample_num

        if self.is_latent:
            def fn(params, rng, x_cond, stats):
                return self.model.sample(params, rng, x_cond, clip_denoised=clip,
                                         latent_stats=stats, num_samples=n)
        else:
            def fn(params, rng, x_cond, stats):
                return self.model.sample(params, rng, x_cond, clip_denoised=clip,
                                         num_samples=n)

        return jax.jit(fn)

    def _ema_sample_params(self):
        """Sampling uses EMA weights (reference sample_step applies the shadow)."""
        params = self.state.ema_params if self.use_ema else self.state.params
        return self._place_for_sampling(params)

    def _sample_stats(self):
        return self._place_for_sampling(self.state.latent_stats)

    @functools.cached_property
    def _sample_mid_fn(self):
        clip = self.config.testing.get("clip_denoised", False)

        if self.is_latent:
            def fn(params, rng, x_cond, stats):
                return self.model.sample(params, rng, x_cond, clip_denoised=clip,
                                         sample_mid_step=True, latent_stats=stats)
        else:
            def fn(params, rng, x_cond, stats):
                return self.model.sample(params, rng, x_cond, clip_denoised=clip,
                                         sample_mid_step=True)

        return jax.jit(fn)

    def sample(self, batch, sample_path, stage="train"):
        """4-image grids: skip_sample / condition / ground_truth
        (reference BBDMRunner.py:178-222); with ``testing.sample_mid_step``
        also dumps the reverse trajectory and per-step x0 estimates
        (the reference carries this path commented out, `:195-204`)."""
        sample_path = make_dir(os.path.join(sample_path, f"{stage}_sample"))
        to_normal = self.config.data.dataset_config.to_normal
        grid_size = 4

        x = np.asarray(batch["x"])[:4]
        x_cond = np.asarray(batch["x_cond"])[:4]
        # one placement per call: on multi-host these re-place the full EMA
        # tree onto the local sampling mesh through the host copy
        params = self._ema_sample_params()
        stats = self._sample_stats()

        if self.config.testing.get("sample_mid_step", False):
            imgs, one_step = self._sample_mid_fn(
                params, self.next_sample_rng(), jnp.asarray(x_cond), stats)
            if self.is_main_process:
                self.save_images(
                    np.asarray(imgs), make_dir(os.path.join(sample_path, "reverse_sample")),
                    grid_size, save_interval=max(len(self.model.steps) // 4, 1),
                    writer_tag=f"{stage}_sample" if stage != "test" else None)
                self.save_images(
                    np.asarray(one_step),
                    make_dir(os.path.join(sample_path, "reverse_one_step_samples")),
                    grid_size, save_interval=max(len(self.model.steps) // 4, 1),
                    writer_tag=f"{stage}_one_step_sample" if stage != "test" else None)
        sample = np.asarray(
            self._sample_fn(
                params, self.next_sample_rng(), self._put_sample_batch(x_cond), stats,
            )
        )

        # file/TB writes are rank-0-only: under multi-host TP/FSDP every
        # process runs the computation above (its gathers are collectives),
        # but all processes share one filesystem tree
        if not self.is_main_process:
            return
        for name, img in (("skip_sample", sample), ("condition", x_cond), ("ground_truth", x)):
            grid = get_image_grid(img, grid_size, to_normal=to_normal)
            from PIL import Image

            Image.fromarray(grid).save(os.path.join(sample_path, f"{name}.png"))
            if stage != "test":
                tag = {"skip_sample": f"{stage}_skip_sample",
                       "condition": f"{stage}_condition",
                       "ground_truth": f"{stage}_ground_truth"}[name]
                self.writer.add_image(tag, grid, self.global_step, dataformats="HWC")

    def sample_to_eval(self, test_loader, sample_path):
        """Test-set sweep with the exact output contract of
        reference BBDMRunner.py:224-253."""
        condition_path = make_dir(os.path.join(sample_path, "condition"))
        gt_path = make_dir(os.path.join(sample_path, "ground_truth"))
        result_path = make_dir(
            os.path.join(sample_path, str(self.config.model.BB.params.sample_step))
        )
        to_normal = self.config.data.dataset_config.to_normal
        sample_num = self.config.testing.sample_num
        params = self._ema_sample_params()
        stats = self._sample_stats()

        # bounded in-flight queue of async device dispatches spanning batch
        # boundaries: the device never idles during host-side PNG encodes
        # (JAX dispatch is async; np.asarray on the oldest entry is the sync)
        from collections import deque

        inflight: deque = deque()
        max_inflight = 2

        def drain_one():
            dev, batch_np = inflight.popleft()
            samples = np.asarray(dev)  # [sample_num, B, H, W, C]
            x, x_cond_np, x_names, cond_names = batch_np
            for i in range(x.shape[0]):
                save_single_image(x_cond_np[i], condition_path,
                                  f"{cond_names[i]}.png", to_normal=to_normal)
                save_single_image(x[i], gt_path, f"{x_names[i]}.png",
                                  to_normal=to_normal)
                if sample_num > 1:
                    result_path_i = make_dir(os.path.join(result_path, x_names[i]))
                    for j in range(sample_num):
                        save_single_image(samples[j, i], result_path_i,
                                          f"output_{j}.png", to_normal=to_normal)
                else:
                    save_single_image(samples[0, i], result_path,
                                      f"{x_names[i]}.png", to_normal=to_normal)

        for test_batch in test_loader:
            x_cond = self._put_sample_batch(test_batch["x_cond"])
            batch_np = (np.asarray(test_batch["x"]), np.asarray(test_batch["x_cond"]),
                        test_batch["x_name"], test_batch["x_cond_name"])
            while len(inflight) >= max_inflight:
                drain_one()
            # all sample_num draws in ONE dispatch (encode/context/pre-cast
            # shared across draws); [1, ...] from _sample_fn when sample_num=1
            if sample_num > 1:
                dev = self._sample_multi_fn(params, self.next_sample_rng(),
                                            x_cond, stats)
            else:
                dev = self._sample_fn(params, self.next_sample_rng(), x_cond,
                                      stats)[None]
            inflight.append((dev, batch_np))
        while inflight:
            drain_one()
