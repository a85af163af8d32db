"""BaseRunner: the training/eval lifecycle engine.

Functional re-design of the reference's `runners/BaseRunner.py:25-595`: the
mutable net/optimizer/EMA/counters become one jit-compiled, mesh-replicated
``TrainState``; the epoch loop stays host-side and drives cadence (every-50-step
validation, epoch-fraction sampling, save_interval checkpoints) around the
compiled step without retriggering compilation.

Lifecycle parity:
  * result-dir layout + config snapshot + TensorBoard writer (`:43-56`)
  * model/optimizer/scheduler init through subclass hooks (`:264-336`)
  * EMA with warmup + interval (inside the jitted step)
  * checkpoint load incl. optimizer/scheduler state on resume (`:111-138`)
  * train loop with grad accumulation, interleaved validation and sampling,
    latest+last+top-k checkpoint retention, emergency save on exception
    (`:338-554` — the reference's exception save is gated on the *wrong* rank,
    `:538`; here it runs on the main process)
  * test(): EMA weights, sample_to_eval sweep or single-batch sample (`:556-595`)

Data parallelism: batches are sharded over the mesh 'data' axis, state is
replicated; each host loads its own shard of the dataset (the
DistributedSampler equivalent).
"""

from __future__ import annotations

import os
import time
import traceback
from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from bbdm_tpu.checkpoints.io import load_checkpoint, save_checkpoint
from bbdm_tpu.config import ConfigNode, save_config
from bbdm_tpu.data import DataLoader, get_dataset
from bbdm_tpu.parallel import fetch_tree, make_mesh, place_state, replicate, shard_batch
from bbdm_tpu.runners.utils import make_dir, make_save_dirs, remove_file
from bbdm_tpu.training import TrainState, make_eval_step, make_train_step
from bbdm_tpu.training.state import zeros_like_tree
from bbdm_tpu.utils.tboard import SummaryWriter


class BaseRunner(ABC):
    def __init__(self, config):
        self.config = config
        self.is_main_process = jax.process_index() == 0
        self.global_epoch = 0
        self.global_step = -1 if config.args.sample_at_start else 0
        self.topk_checkpoints = {}

        # result dir layout (reference :43-51)
        self.config.result = ConfigNode()
        (
            self.config.result.result_path,
            self.config.result.image_path,
            self.config.result.ckpt_path,
            self.config.result.log_path,
            self.config.result.sample_path,
            self.config.result.sample_to_eval_path,
        ) = make_save_dirs(
            self.config.args,
            prefix=self.config.data.dataset_name,
            suffix=self.config.model.model_name,
        )
        self.logger("save training results to " + self.config.result.result_path)
        self.save_config()
        self.writer = SummaryWriter(self.config.result.log_path)

        # opt-in debug/observability (SURVEY.md §5 aux subsystems)
        if config.training.get("debug_nan", False):
            jax.config.update("jax_debug_nans", True)

        # mesh + model + state; training.mesh_devices caps the data-parallel
        # width (default: all local devices); training.mesh_device_ids (set
        # by --gpu_ids, the reference's per-GPU process list) picks a subset
        mesh_ids = config.training.get("mesh_device_ids", None)
        n_mesh = config.training.get("mesh_devices", None)
        if mesh_ids:
            all_devices = jax.devices()
            devices = [all_devices[i] for i in mesh_ids]
        elif n_mesh:
            devices = jax.devices()[:n_mesh]
        else:
            devices = None
        # training.model_parallel: tensor-parallel width over the mesh
        # 'model' axis (parallel/tp.py); default 1 = pure data parallelism.
        # training.fsdp: additionally shard params/moments/EMA over the
        # 'data' axis (ZeRO-3 layout, same file)
        self.model_parallel = int(config.training.get("model_parallel", 1) or 1)
        self.fsdp = bool(config.training.get("fsdp", False))
        self.mesh = make_mesh(devices, model_parallel=self.model_parallel)
        self.rng = jax.random.PRNGKey(config.args.seed)
        self.model = self.initialize_model(config)
        self.rng, init_rng = jax.random.split(self.rng)
        params = self.model.init_params(init_rng)
        params = self.on_params_initialized(params)
        self.print_model_summary(params)

        self.use_ema = (
            config.model.EMA.use_ema if "EMA" in config.model else False
        )

        # training.fuse_small_leaves: optimizer-path bucketing of the small
        # trainable leaves (training/bucket.py); set by the subclass's
        # initialize_optimizer_scheduler when enabled
        self.bucketer = None
        self.tx, self.lr_scheduler_config, init_lr = self.initialize_optimizer_scheduler(
            params, config
        )
        self.state = self.build_initial_state(params, init_lr)
        self.load_model_from_checkpoint()
        self._train_step = jax.jit(self.build_train_step(), donate_argnums=(0,))
        self._eval_step = jax.jit(self.build_eval_step())

    def build_initial_state(self, params, init_lr):
        from bbdm_tpu.training.ema import ema_init
        from bbdm_tpu.training.plateau import plateau_init

        accumulate = self.config.training.get("accumulate_grad_batches", 1)
        # with fuse_small_leaves, the optimizer state and the gradient
        # accumulator live over the BUCKETED structure
        opt_params = self.bucketer.bucket(params) if self.bucketer else params
        return TrainState(
            step=jnp.asarray(self.global_step, jnp.int32),
            params=params,
            ema_params=ema_init(params) if self.use_ema else None,
            opt_state=self.tx.init(opt_params),
            plateau=plateau_init(init_lr),
            grad_accum=zeros_like_tree(opt_params) if accumulate > 1 else None,
            latent_stats=self.default_latent_stats(),
        )

    def build_train_step(self):
        ema_cfg = self.config.model.EMA if "EMA" in self.config.model else None
        return make_train_step(
            self.model, self.tx, self.config.training,
            ema_config=ema_cfg, lr_scheduler_config=self.lr_scheduler_config,
            bucketer=self.bucketer,
        )

    def build_eval_step(self):
        return make_eval_step(self.model)

    # ------------------------------------------------------------- helpers

    def logger(self, msg, **kwargs):
        if self.is_main_process:
            print(msg, **kwargs)

    def save_config(self):
        if self.is_main_process:
            save_config(self.config, os.path.join(self.config.result.ckpt_path, "config.yaml"))

    def default_latent_stats(self):
        return None

    def next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def next_sample_rng(self):
        """Sampling draws come from a SEPARATE stream: sampling cadence is
        rank-gated (and, under multi-host TP/FSDP, collective), so advancing
        the training stream here would silently desynchronize the rng keys
        the per-process train steps feed the global-mesh computation."""
        if not hasattr(self, "_sample_rng"):
            self._sample_rng = jax.random.fold_in(
                jax.random.PRNGKey(self.config.args.seed), 0x5A4D50)
        self._sample_rng, sub = jax.random.split(self._sample_rng)
        return sub

    @property
    def _cross_host_state(self):
        """True when the TrainState is sharded across processes (multi-host
        TP/FSDP): checkpoint fetches and sampling-path gathers are then
        collectives, so the otherwise rank-0-only call sites must be entered
        by EVERY process (file/TB writes stay rank-0-gated inside)."""
        return jax.process_count() > 1 and (self.model_parallel > 1 or self.fsdp)

    @property
    def sample_mesh(self):
        """Sampling runs on a HOST-LOCAL mesh: each process samples its own
        dataset shard independently (reference rank-sharded eval and
        rank-0-only mid-train sampling, BaseRunner.py:445-452,562-575).
        Using the global mesh here would (a) turn rank-0-only sampling into
        a deadlocked cross-process collective and (b) produce outputs that
        np.asarray cannot fetch (non-addressable shards)."""
        if not hasattr(self, "_sample_mesh"):
            if jax.process_count() > 1:
                from bbdm_tpu.parallel import make_mesh as _make_mesh

                self._sample_mesh = _make_mesh(jax.local_devices())
            else:
                self._sample_mesh = self.mesh
        return self._sample_mesh

    def _place_for_sampling(self, tree):
        """Re-place a (possibly global-mesh, possibly cross-process-sharded)
        tree onto the host-local sampling mesh, through the host copy —
        device_put across process-spanning shardings is not generally legal.
        Under multi-host TP/FSDP the fetch is a COLLECTIVE (fetch_tree):
        every process must reach this call, which the sampling call sites
        guarantee via _cross_host_state gating."""
        if tree is None or self.sample_mesh is self.mesh:
            return tree
        return replicate(self.sample_mesh, fetch_tree(tree))

    def _put_sample_batch(self, x_cond):
        """Shard a batch over the sampling mesh's 'data' axis when it
        divides evenly (all local chips compute in parallel); otherwise
        fall back to single-device placement."""
        x_cond = jnp.asarray(x_cond)
        n = self.sample_mesh.shape.get("data", 1)
        if n > 1 and x_cond.shape[0] % n == 0:
            return shard_batch(self.sample_mesh, x_cond)
        return x_cond

    def _put_batch(self, batch):
        return (
            shard_batch(self.mesh, batch["x"]),
            shard_batch(self.mesh, batch["x_cond"]),
        )

    # -------------------------------------------------------- checkpointing

    def get_checkpoint_states(self, stage="epoch_end"):
        """Model + optimizer checkpoint dicts (reference :140-170).

        Under multi-host TP/FSDP the fetches are collectives (fetch_tree
        all-gathers the cross-process shards): every process must call this
        in the same order; only rank 0 then writes the files."""
        state = self.state
        model_states = {
            "step": int(state.step),
            "model": serialization.to_state_dict(fetch_tree(state.params)),
            # epoch_end saves resume at the NEXT epoch; exception/graceful_stop
            # saves land mid-epoch and must redo the partial epoch on resume
            "epoch": self.global_epoch + 1 if stage == "epoch_end" else self.global_epoch,
        }
        if self.use_ema:
            model_states["ema"] = serialization.to_state_dict(fetch_tree(state.ema_params))
        optimizer_scheduler_states = {
            "optimizer": [serialization.to_state_dict(fetch_tree(state.opt_state))],
            "scheduler": [serialization.to_state_dict(fetch_tree(state.plateau))],
        }
        return model_states, optimizer_scheduler_states

    def load_model_from_checkpoint(self):
        """Restore params/EMA/counters (+ optimizer/scheduler when training)
        from config.model.model_load_path (reference :111-138)."""
        model_states = None
        path = self.config.model.get("model_load_path")
        if path:
            self.logger(f"load model {self.config.model.model_name} from {path}")
            model_states = load_checkpoint(path)
            self.global_epoch = int(model_states["epoch"])
            self.global_step = int(model_states["step"])
            params = serialization.from_state_dict(self.state.params, model_states["model"])
            ema = self.state.ema_params
            if self.use_ema and "ema" in model_states:
                ema = serialization.from_state_dict(self.state.ema_params, model_states["ema"])
            self.state = self.state.replace(
                step=jnp.asarray(self.global_step, jnp.int32), params=params, ema_params=ema
            )
            if self.config.args.train:
                opt_path = self.config.model.get("optim_sche_load_path")
                if opt_path:
                    osd = load_checkpoint(opt_path)
                    try:
                        opt_state = serialization.from_state_dict(
                            self.state.opt_state, osd["optimizer"][0]
                        )
                    except (ValueError, KeyError) as e:
                        # the most likely structural mismatch: the checkpoint
                        # was written with a different training.fuse_small_leaves
                        # setting (bucketed opt-state trees nest differently)
                        raise ValueError(
                            f"optimizer state in {opt_path} does not match the "
                            "current optimizer tree. If this checkpoint was "
                            "written with a different training.fuse_small_leaves "
                            "setting, resume with the SAME setting (bucketed "
                            f"and per-leaf optimizer states are not "
                            f"interconvertible): {e}"
                        ) from e
                    plateau = serialization.from_state_dict(
                        self.state.plateau, osd["scheduler"][0]
                    )
                    self.state = self.state.replace(opt_state=opt_state, plateau=plateau)
        return model_states

    # -------------------------------------------------------------- hooks

    @abstractmethod
    def print_model_summary(self, params):
        ...

    @abstractmethod
    def initialize_model(self, config):
        """Return the model object (provides init_params/loss/sample)."""
        ...

    @abstractmethod
    def initialize_optimizer_scheduler(self, params, config):
        """Return (optax transform, lr_scheduler config node, initial lr)."""
        ...

    @abstractmethod
    def sample(self, batch, sample_path, stage="train"):
        """Sample a single batch to PNG grids."""
        ...

    @abstractmethod
    def sample_to_eval(self, test_loader, sample_path):
        """Sweep the test set for offline metric evaluation."""
        ...

    def on_save_checkpoint(self, train_loader, val_loader, epoch, step):
        pass

    def on_params_initialized(self, params):
        """Hook to patch freshly-initialized params (e.g. load a frozen
        first-stage checkpoint) before any state is built."""
        return params

    # ----------------------------------------------------------- val/sample

    def validation_step(self, val_batch, epoch, step):
        x, y = self._put_batch(val_batch)
        loss = self._eval_step(self.state, x, y, self.next_rng())
        if self.is_main_process:
            self.writer.add_scalar("loss/val_step", float(loss), step)
        return float(loss)

    def validation_epoch(self, val_loader, epoch):
        loss_sum, count = 0.0, 0
        for val_batch in val_loader:
            x, y = self._put_batch(val_batch)
            loss_sum += float(self._eval_step(self.state, x, y, self.next_rng()))
            count += 1
        average_loss = loss_sum / max(count, 1)
        if self.is_main_process:
            self.writer.add_scalar("val_epoch/loss", average_loss, epoch)
        return average_loss

    def sample_step(self, train_batch, val_batch):
        """Mid-training sample grids with EMA weights (reference :251-262)."""
        sample_path = make_dir(
            os.path.join(self.config.result.image_path, str(self.global_step))
        )
        self.sample(train_batch, sample_path, stage="train")
        self.sample(val_batch, sample_path, stage="val")

    # --------------------------------------------------------------- train

    def _build_loaders(self, for_training=True):
        train_ds, val_ds, test_ds = get_dataset(self.config.data)
        shard_kw = dict(
            shard_count=jax.process_count(),
            shard_index=jax.process_index(),
            seed=self.config.args.seed,
        )
        train_loader = DataLoader(
            train_ds, self.config.data.train.batch_size,
            shuffle=self.config.data.train.get("shuffle", True), drop_last=True, **shard_kw,
        )
        val_loader = DataLoader(
            val_ds, self.config.data.val.batch_size,
            shuffle=self.config.data.val.get("shuffle", True), drop_last=True, **shard_kw,
        )
        test_loader = DataLoader(
            test_ds, self.config.data.test.batch_size,
            shuffle=False, drop_last=True, **shard_kw,
        )
        # training.device_data_cache: HBM-resident train/val sets with
        # on-device batch gather — identical batch contents, per-step host
        # uploads reduced to index vectors (data/device_cache.py; the test
        # loader stays host-side: sample_to_eval is output-dominated).
        # test()/sample_to_eval never iterate the train split, so skip the
        # eager multi-GB decode+upload there (for_training=False) — observed
        # to cost ~13 min per sweep variant on the 256² chain dataset.
        if for_training:
            from bbdm_tpu.data.device_cache import maybe_device_cache

            train_loader = maybe_device_cache(
                train_loader, self.mesh, self.config.training, self.logger)
            val_loader = maybe_device_cache(
                val_loader, self.mesh, self.config.training, self.logger)
        return train_loader, val_loader, test_loader

    def train(self):
        self.logger(self.__class__.__name__)
        train_loader, val_loader, test_loader = self._build_loaders()
        epoch_length = len(train_loader)
        start_epoch = self.global_epoch
        self.logger(
            f"start training {self.config.model.model_name} on "
            f"{self.config.data.dataset_name}, {epoch_length} iters per epoch"
        )
        self.logger(
            f"mesh {dict(self.mesh.shape)} | model_parallel={self.model_parallel}"
            f" | fsdp={'on (ZeRO-3 state layout)' if self.fsdp else 'off'}"
        )
        self.state = place_state(self.mesh, self.state, self.model_parallel, self.fsdp)

        training = self.config.training
        sample_every = max(int(training.sample_interval * epoch_length), 1)
        val_iter = None

        def next_val_batch():
            nonlocal val_iter
            if val_iter is None:
                val_iter = iter(val_loader)
            try:
                return next(val_iter)
            except StopIteration:
                val_iter = iter(val_loader)
                return next(val_iter)

        # opt-in profiler trace over a step window (training.profile_dir)
        profile_dir = training.get("profile_dir", None)
        profile_start = training.get("profile_start_step", 10)
        profile_steps = training.get("profile_steps", 5)
        profiling = False

        # ---- graceful stop (cooperative, honored at step boundaries) ------
        # Three triggers end training with an ORDERLY latest+last checkpoint
        # save and a normal return — the process can exit cleanly or proceed
        # to its next phase with no emergency unwind and no in-flight device
        # work (an abrupt client exit can strand the TPU-server claim for
        # ~40-75 min — CLAUDE.md claim economics):
        #   * SIGTERM: FIRST delivery requests the graceful stop; a SECOND
        #     escalates to the legacy emergency-save raise (wedged-step
        #     safety, and the reference-parity behavior `BaseRunner.py:537-554`)
        #   * stop file: `touch <result>/<model>/STOP` from another shell
        #     (consumed on honor, so a later resume doesn't instantly stop)
        #   * wall budget: `training.max_wall_sec` caps this train() call —
        #     time-boxing for bounded sessions / preemptible capacity
        stop_reason = None
        unwinding = False
        train_t0 = time.monotonic()
        max_wall = training.get("max_wall_sec", None)
        stop_file = training.get(
            "stop_file", os.path.join(self.config.result.result_path, "STOP"))
        stop_sync_every = max(int(training.get("stop_sync_interval", 25)), 1)
        nprocs = jax.process_count()

        def _local_stop_trigger():
            if stop_reason is not None:
                return stop_reason
            if max_wall is not None and time.monotonic() - train_t0 > float(max_wall):
                return f"wall budget ({max_wall}s) exhausted"
            if stop_file and os.path.exists(stop_file):
                return f"stop file {stop_file} present"
            return None

        def _poll_stop():
            nonlocal stop_reason
            if nprocs == 1:
                stop_reason = _local_stop_trigger()
                return stop_reason
            # multi-host: the cadenced validation/sampling/save paths are
            # collective, so the stop decision must be identical everywhere.
            # Rank 0 evaluates the triggers; every process adopts its answer
            # at a fixed step cadence. (A SIGTERM delivered to a non-zero
            # rank alone does not stop gracefully — the handler ignores it
            # there so this rank never breaks out of the collective loop on
            # its own; its second delivery escalates to the emergency raise.)
            if self.global_step % stop_sync_every != 0:
                return None
            import numpy as _np
            from jax.experimental import multihost_utils

            flag = _np.int32(
                1 if (self.is_main_process and _local_stop_trigger()) else 0)
            if int(multihost_utils.broadcast_one_to_all(flag)) == 1:
                stop_reason = (_local_stop_trigger() if self.is_main_process
                               else "stop broadcast from rank 0")
            return stop_reason

        # SIGTERM (preemption / cluster manager): first delivery defers to
        # the graceful stop above; repeats route into the emergency-save
        # exception path (SURVEY.md §5)
        import signal

        sigterm_seen = False

        def _sigterm(signum, frame):
            nonlocal stop_reason, sigterm_seen
            if unwinding or sigterm_seen or stop_reason is not None:
                raise KeyboardInterrupt("SIGTERM")
            sigterm_seen = True
            if nprocs > 1 and not self.is_main_process:
                # The stop decision is rank-0's broadcast alone: setting
                # stop_reason here would break ONLY this rank out of the
                # collective train loop (validation/ckpt fetches are
                # collectives) — divergence/deadlock. Ignore the first
                # delivery; the second escalates to the emergency raise above.
                self.logger("SIGTERM on a non-main rank: ignored for the "
                            "graceful stop (rank 0 decides; send again to "
                            "force the emergency-save raise)")
                return
            stop_reason = "SIGTERM"
            self.logger("SIGTERM: stopping at the next step boundary "
                        "(send again to force the emergency-save raise)")

        old_handler = None
        try:
            old_handler = signal.signal(signal.SIGTERM, _sigterm)
        except ValueError:  # not the main thread
            pass

        average_loss = float("nan")
        try:
            for epoch in range(start_epoch, training.n_epochs):
                if self.global_step > training.n_steps:
                    break
                train_loader.set_epoch(epoch)
                val_loader.set_epoch(epoch)
                self.global_epoch = epoch
                start_time = time.time()

                pending_log = None  # (step, device metrics) — logged one step late
                for train_batch in train_loader:
                    x, y = self._put_batch(train_batch)
                    self.state, metrics = self._train_step(self.state, x, y, self.next_rng())
                    self.global_step += 1

                    if profile_dir and self.is_main_process:
                        if self.global_step == profile_start and not profiling:
                            jax.profiler.start_trace(profile_dir)
                            profiling = True
                        elif profiling and self.global_step >= profile_start + profile_steps:
                            jax.profiler.stop_trace()
                            profiling = False
                            self.logger(f"profiler trace written to {profile_dir}")

                    if self.is_main_process:
                        # fetch the PREVIOUS step's loss after dispatching this
                        # one: float() is a device sync, and syncing on the
                        # just-dispatched step would stall the pipeline
                        if pending_log is not None:
                            self.writer.add_scalar(
                                "loss/train", float(pending_log[1]["loss"]), pending_log[0])
                        pending_log = (self.global_step, metrics)

                    if self.global_step % 50 == 0:
                        self.validation_step(next_val_batch(), epoch, self.global_step)

                    if self.global_step % sample_every == 0 and (
                            self.is_main_process or self._cross_host_state):
                        # under multi-host TP/FSDP every process enters: the
                        # EMA/param gathers inside sample() are collectives;
                        # file/TB writes stay rank-0-gated inside sample()
                        self.sample_step(train_batch=train_batch, val_batch=next_val_batch())

                    if _poll_stop():
                        break

                if pending_log is not None and self.is_main_process:
                    self.writer.add_scalar(
                        "loss/train", float(pending_log[1]["loss"]), pending_log[0])

                elapsed = int(round(time.time() - start_time))
                self.logger(f"training time: {elapsed}s (epoch {epoch + 1})")

                # epoch validation (reference :459-466) — skipped on a
                # graceful stop: promptness beats one more val number
                if stop_reason is None and (
                    (epoch + 1) % training.validation_interval == 0
                    or (epoch + 1) == training.n_epochs
                ):
                    self.logger("validating epoch...")
                    average_loss = self.validation_epoch(val_loader, epoch)
                    self.logger(f"validating epoch success (avg loss {average_loss:.6f})")

                # checkpoints (reference :468-534)
                save_now = (
                    stop_reason is not None
                    or (epoch + 1) % training.save_interval == 0
                    or (epoch + 1) == training.n_epochs
                    or self.global_step > training.n_steps
                )
                if stop_reason is not None:
                    self.logger(f"graceful stop ({stop_reason}): saving "
                                "latest checkpoint, then returning cleanly")
                if save_now and (self.is_main_process or self._cross_host_state):
                    self.logger("saving latest checkpoint...")
                    self.on_save_checkpoint(train_loader, val_loader, epoch, self.global_step)
                    # the state fetch is collective under multi-host TP/FSDP
                    # — every process participates; only rank 0 writes below
                    model_states, optim_states = self.get_checkpoint_states(
                        stage="graceful_stop" if stop_reason is not None
                        else "epoch_end")
                if save_now and self.is_main_process:
                    ckpt_path = self.config.result.ckpt_path
                    # drain pending writers before deleting: a remove racing
                    # an in-flight os.replace would resurrect the file
                    from bbdm_tpu.checkpoints.io import wait_for_saves

                    wait_for_saves()
                    for temp in range(epoch + 1):
                        remove_file(os.path.join(ckpt_path, f"latest_model_{temp}.ckpt"))
                        remove_file(os.path.join(ckpt_path, f"latest_optim_sche_{temp}.ckpt"))
                    # background: training pays only the device->host fetch;
                    # the msgpack serialize + disk write overlap the next
                    # steps (checkpoints/io.py)
                    save_checkpoint(
                        model_states,
                        os.path.join(ckpt_path, f"latest_model_{epoch + 1}.ckpt"),
                        background=True)
                    save_checkpoint(
                        optim_states,
                        os.path.join(ckpt_path, f"latest_optim_sche_{epoch + 1}.ckpt"),
                        background=True)
                    save_checkpoint(model_states, os.path.join(ckpt_path, "last_model.ckpt"),
                                    background=True)
                    save_checkpoint(optim_states, os.path.join(ckpt_path, "last_optim_sche.ckpt"),
                                    background=True)

                    if self.config.args.save_top:
                        self._save_top_checkpoint(average_loss, epoch, model_states, optim_states)

                if stop_reason is not None:
                    # consume the stop file so a later resume doesn't stop
                    # instantly; then return through the normal epilogue
                    if self.is_main_process and stop_file and os.path.exists(stop_file):
                        os.remove(stop_file)
                    break
        except BaseException as e:
            unwinding = True
            # reference bug `:538` gates on the wrong rank — save on rank 0.
            # Under multi-host TP/FSDP the fetch is collective, so every
            # process participates; best-effort by nature — it completes when
            # the failure is global (SIGTERM/preemption delivered everywhere,
            # the common case) and times out at the distributed-runtime
            # deadline when a single process died alone.
            if self.is_main_process or self._cross_host_state:
                self.logger("exception save model start....")
                model_states, optim_states = self.get_checkpoint_states(stage="exception")
                if self.is_main_process:
                    ckpt_path = self.config.result.ckpt_path
                    save_checkpoint(model_states, os.path.join(ckpt_path, "last_model.ckpt"))
                    save_checkpoint(optim_states, os.path.join(ckpt_path, "last_optim_sche.ckpt"))
                    self.logger("exception save model success!")
            print("str(e):", str(e))
            traceback.print_exc()
            # re-raise so the process exits non-zero and schedulers see the
            # failure (the reference swallows everything but ^C and exits 0
            # after a crash, `:537-554` — a bad contract for any supervisor)
            raise
        finally:
            # all background checkpoint writers must land before we return
            # (or before a supervisor reacts to our exit code)
            from bbdm_tpu.checkpoints.io import wait_for_saves

            # NOTE: an explicit flag, not sys.exc_info() — the latter also
            # reports exceptions merely being HANDLED in outer frames (e.g. a
            # supervisor retrying train() inside its own except:), which would
            # silently demote a writer failure on an otherwise-clean run
            if unwinding:
                # already unwinding with a training exception: a writer
                # failure raised here would REPLACE it as the propagating
                # exception (demoting the root cause to __context__) —
                # log it instead and let the original error surface
                try:
                    wait_for_saves()
                except Exception as we:  # noqa: BLE001
                    self.logger(f"background checkpoint writer failed during "
                                f"exception unwind: {we!r}")
            else:
                wait_for_saves()
            if old_handler is not None:
                signal.signal(signal.SIGTERM, old_handler)
            # expose why training ended (None = ran to completion): phase
            # chains (scripts/train_chain_demo.py) must distinguish an
            # intentional time-box (wall budget) from an external interrupt
            # (SIGTERM / stop file) that should end the whole chain resumably
            self.stop_reason = stop_reason

    def _save_top_checkpoint(self, average_loss, epoch, model_states, optim_states):
        """Single-slot best-val-loss checkpoint (reference :498-534)."""
        ckpt_path = self.config.result.ckpt_path
        model_name = f"top_model_epoch_{epoch + 1}.ckpt"
        optim_name = f"top_optim_sche_epoch_{epoch + 1}.ckpt"
        top = self.topk_checkpoints.get("top")
        if top is not None and not (average_loss < top["loss"]):
            return
        if top is not None:
            from bbdm_tpu.checkpoints.io import wait_for_path

            # settle only the two files being deleted (a full wait_for_saves
            # here would stall on the just-dispatched latest/last writes)
            for name in (top["model_ckpt_name"], top["optim_sche_ckpt_name"]):
                wait_for_path(os.path.join(ckpt_path, name))
            remove_file(os.path.join(ckpt_path, top["model_ckpt_name"]))
            remove_file(os.path.join(ckpt_path, top["optim_sche_ckpt_name"]))
        self.logger(f"saving top checkpoint: average_loss={average_loss} epoch={epoch + 1}")
        self.topk_checkpoints["top"] = {
            "loss": average_loss,
            "model_ckpt_name": model_name,
            "optim_sche_ckpt_name": optim_name,
        }
        save_checkpoint(model_states, os.path.join(ckpt_path, model_name),
                        background=True)
        save_checkpoint(optim_states, os.path.join(ckpt_path, optim_name),
                        background=True)

    # ---------------------------------------------------------------- test

    def test(self):
        """reference :556-595."""
        _, val_loader, test_loader = self._build_loaders(for_training=False)
        if len(test_loader) == 0:
            test_loader = val_loader
        self.state = place_state(self.mesh, self.state, self.model_parallel, self.fsdp)
        if self.config.args.sample_to_eval:
            self.sample_to_eval(test_loader, self.config.result.sample_to_eval_path)
        elif self.is_main_process or self._cross_host_state:
            # single-batch sample mode writes on rank 0 only: every process
            # writing its own shard to the SAME grid paths would race/corrupt
            # them. Under multi-host TP/FSDP every process still enters (the
            # param gathers inside sample() are collectives); writes stay
            # rank-0-gated inside sample().
            # The loaders above are process-sharded; rebuild UNSHARDED here so
            # rank 0 draws from the full test set rather than silently
            # sampling only its own 1/P shard (ADVICE round 2)
            if jax.process_count() > 1:
                _, val_ds, test_ds = get_dataset(self.config.data)
                full_kw = dict(shuffle=False, drop_last=True,
                               shard_count=1, shard_index=0,
                               seed=self.config.args.seed)
                test_loader = DataLoader(
                    test_ds, self.config.data.test.batch_size, **full_kw)
                if len(test_loader) == 0:
                    test_loader = DataLoader(
                        val_ds, self.config.data.val.batch_size, **full_kw)
            for i, test_batch in enumerate(test_loader):
                sample_path = os.path.join(self.config.result.sample_path, str(i))
                self.sample(test_batch, sample_path, stage="test")
                break
