"""Worker process for the 2-process multi-host test (test_multihost.py).

Each worker is one "host" with 2 virtual CPU devices (4 global). It goes
through the production init path (BBDM_MULTIHOST=1 ->
maybe_initialize_distributed), checks that shard_batch assembles the GLOBAL
batch from per-process shards (the round-1 advisor finding), then drives a
full 1-epoch BBDMRunner.train() with the per-host sharded loader and
rank-0-only checkpointing.

Usage: multihost_worker.py <process_id> <port> <workdir>
(the parent creates <workdir>/data as a synthetic custom_aligned set)
"""

import os
import sys


def main():
    idx, port, root = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        + " --xla_cpu_collective_timeout_seconds=600"
    )
    os.environ["BBDM_MULTIHOST"] = "1"
    os.environ["BBDM_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["BBDM_NUM_PROCESSES"] = "2"
    os.environ["BBDM_PROCESS_ID"] = str(idx)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from bbdm_tpu.parallel import maybe_initialize_distributed

    assert maybe_initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    import numpy as np

    from bbdm_tpu.parallel import make_mesh, shard_batch

    # ---- global-batch assembly: each host contributes DISTINCT samples;
    # the jitted global mean must see all of them (with the old device_put
    # bug each host would instead see only its own data)
    mesh = make_mesh()
    base = np.arange(6, dtype=np.float32).reshape(2, 3)
    local = base + 100.0 * idx
    g = shard_batch(mesh, local)
    assert g.shape == (4, 3), g.shape
    mean = float(jax.jit(lambda a: a.mean())(g))
    expect = float(np.concatenate([base, base + 100.0]).mean())
    assert abs(mean - expect) < 1e-5, f"global mean {mean} != {expect}"
    print(f"[proc {idx}] global batch mean ok: {mean}")

    # ---- full runner drive: 1 epoch, per-host batch 4 over an 8-image set
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.test_integration import make_args, make_config

    cfg = make_config(root, os.path.join(root, "data"),
                      n_epochs=1, mesh_devices=None, accumulate_grad_batches=1,
                      sample_interval=1)  # mid-train sampling fires at step 1
                      # on rank 0 ONLY — must run on the host-local sampling
                      # mesh (a global-mesh collective from one process
                      # deadlocks; runners/bbdm.py sample_mesh)
    cfg.data.train.batch_size = 4
    cfg.data.val.batch_size = 4
    cfg.data.test.batch_size = 4
    # separate result dirs per process to observe rank-0-only checkpointing
    cfg.args = make_args(os.path.join(root, f"results_p{idx}"))

    from bbdm_tpu.registry import get_runner

    runner = get_runner("BBDMRunner", cfg)
    assert runner.mesh.devices.size == 4
    assert runner.sample_mesh.devices.size == 2  # host-local sampling mesh
    runner.train()
    assert runner.global_step == 1, runner.global_step
    ckpt = os.path.join(runner.config.result.ckpt_path, "last_model.ckpt")
    has_ckpt = os.path.exists(ckpt)
    assert has_ckpt == (idx == 0), f"rank-0-only ckpt violated: proc {idx} has_ckpt={has_ckpt}"
    if idx == 0:  # rank-0 mid-train sampling actually produced grids
        img_dir = os.path.join(runner.config.result.image_path, "1")
        assert os.path.isdir(img_dir), img_dir
    print(f"[proc {idx}] train ok, rank0_ckpt={has_ckpt}")

    # ---- shared-dir sample_to_eval: each process samples ITS dataset shard
    # into the SAME tree (reference rank-sharded eval, BaseRunner.py:562-575);
    # outputs are host-local arrays (np.asarray of a global-mesh result
    # would raise on non-addressable shards)
    from jax.experimental import multihost_utils

    cfg2 = make_config(root, os.path.join(root, "data"),
                       n_epochs=1, mesh_devices=None, accumulate_grad_batches=1)
    cfg2.data.test.batch_size = 4
    cfg2.args = make_args(os.path.join(root, "results_eval"), train=False,
                          sample_to_eval=True)
    runner2 = get_runner("BBDMRunner", cfg2)
    runner2.test()
    multihost_utils.sync_global_devices("eval_done")
    if idx == 0:
        eval_dir = runner2.config.result.sample_to_eval_path
        step_dir = os.path.join(eval_dir, str(cfg2.model.BB.params.sample_step))
        outs = sorted(os.listdir(step_dir))
        assert len(outs) == 8, (len(outs), outs)  # full test set, once each
        conds = sorted(os.listdir(os.path.join(eval_dir, "condition")))
        assert len(conds) == 8, conds
    print(f"[proc {idx}] shared eval sweep ok")

    # ---- latent-stat identity: the normalize_latent pass shards the dataset
    # per host and allgathers the partial sums (runners/bbdm.py
    # get_latent_mean_std) — every host MUST end with identical stats, else
    # each host silently normalizes its latents differently before the
    # gradient all-reduce
    from tests.test_integration_lbbdm import make_lbbdm_config

    cfg3 = make_lbbdm_config(root, os.path.join(root, "data"))
    cfg3.args = make_args(os.path.join(root, f"results_stats_p{idx}"))
    runner3 = get_runner("BBDMRunner", cfg3)
    stats = {k: np.asarray(v) for k, v in runner3.state.latent_stats.items()}
    for k, v in stats.items():
        gathered = np.asarray(multihost_utils.process_allgather(v))
        assert np.array_equal(gathered[0], gathered[1]), (
            f"per-host latent stats diverge for {k}: {gathered}")
    assert float(np.abs(stats["ori_latent_std"] - 1.0).max()) > 1e-3  # real pass
    print(f"[proc {idx}] latent stats identical across hosts")

    # ---- in-framework VQGAN (GAN) training under the same 2-host mesh:
    # two optimizer states, the adaptive-weight double-backward, and
    # BatchNorm batch_stats all ride the sharded global batch; mid-train
    # sampling (sample_interval=1) again exercises the rank-0 host-local
    # placement for GANTrainState
    from tests.test_vqgan_training import make_vqgan_config

    cfg4 = make_vqgan_config(os.path.join(root, f"results_vq_p{idx}"),
                             os.path.join(root, "vq_data"),
                             mesh_devices=None, batch_size=4,
                             sample_interval=1)
    cfg4.model.loss.adaptive_disc_weight = True
    runner4 = get_runner("VQGANRunner", cfg4)
    assert runner4.mesh.devices.size == 4
    runner4.train()
    vq_ckpt = os.path.join(runner4.config.result.ckpt_path, "last_model.ckpt")
    has_vq_ckpt = os.path.exists(vq_ckpt)
    assert has_vq_ckpt == (idx == 0), (
        f"rank-0-only vqgan ckpt violated: proc {idx} has_ckpt={has_vq_ckpt}")
    print(f"[proc {idx}] vqgan train ok, rank0_ckpt={has_vq_ckpt}")

    # ---- multi-host TP + FSDP (VERDICT r3 item 5): mesh (data=2, model=2)
    # with the 'data' axis spanning the two processes, so params/moments/EMA
    # are CROSS-PROCESS sharded. Exercises every collective-participation
    # path: mid-train rank-0 sampling (EMA gather inside sample()), the
    # epoch checkpoint fetch (fetch_tree all-gather), and cross-process
    # state equality after a real optimizer update.
    from bbdm_tpu.parallel import fetch_tree

    cfg5 = make_config(root, os.path.join(root, "data"),
                       n_epochs=1, mesh_devices=None, accumulate_grad_batches=1,
                       sample_interval=1, model_parallel=2, fsdp=True)
    cfg5.data.train.batch_size = 4
    cfg5.data.val.batch_size = 4
    cfg5.data.test.batch_size = 4
    cfg5.args = make_args(os.path.join(root, f"results_tp_p{idx}"))
    runner5 = get_runner("BBDMRunner", cfg5)
    assert dict(runner5.mesh.shape) == {"data": 2, "model": 2}
    runner5.train()
    # the placed state really is cross-process sharded (not a vacuous test)
    spans = any(
        hasattr(leaf, "is_fully_addressable") and not leaf.is_fully_addressable
        for leaf in jax.tree_util.tree_leaves(runner5.state.params))
    assert spans, "TP/FSDP state unexpectedly fully addressable"
    # fetch_tree is collective here; every process must see identical params
    fetched = fetch_tree(runner5.state.params)
    leafsum = np.float64(sum(float(np.asarray(l, np.float64).sum())
                             for l in jax.tree_util.tree_leaves(fetched)))
    sums = np.asarray(multihost_utils.process_allgather(np.asarray([leafsum])))
    assert np.allclose(sums.ravel()[0], sums.ravel()), sums
    tp_ckpt = os.path.join(runner5.config.result.ckpt_path, "last_model.ckpt")
    has_tp_ckpt = os.path.exists(tp_ckpt)
    assert has_tp_ckpt == (idx == 0), (
        f"rank-0-only tp/fsdp ckpt violated: proc {idx} has_ckpt={has_tp_ckpt}")
    if idx == 0:
        # rank-0 mid-train sampling produced grids through the collective
        # gather path, and the checkpoint roundtrips into a PURE-DP layout
        img_dir = os.path.join(runner5.config.result.image_path, "1")
        assert os.path.isdir(img_dir), img_dir
        from bbdm_tpu.checkpoints.io import load_checkpoint

        states = load_checkpoint(tp_ckpt)
        from flax import serialization

        restored = serialization.from_state_dict(fetched, states["model"])
        rsum = sum(float(np.asarray(l, np.float64).sum())
                   for l in jax.tree_util.tree_leaves(restored))
        assert abs(rsum - leafsum) < 1e-3, (rsum, leafsum)
    print(f"[proc {idx}] tp/fsdp train ok, rank0_ckpt={has_tp_ckpt}")

    # ---- graceful stop under multi-host: the stop decision is evaluated by
    # rank 0 (here: a pre-placed STOP file in ITS result dir) and broadcast
    # at the training.stop_sync_interval cadence, so every process leaves
    # the collective train loop at the SAME step boundary and returns
    # normally (runners/base.py _poll_stop)
    cfg6 = make_config(root, os.path.join(root, "data"),
                       n_epochs=50, mesh_devices=None,
                       accumulate_grad_batches=1, stop_sync_interval=1)
    cfg6.data.train.batch_size = 4
    cfg6.data.val.batch_size = 4
    cfg6.data.test.batch_size = 4
    cfg6.args = make_args(os.path.join(root, f"results_gs_p{idx}"),
                          save_top=False)
    runner6 = get_runner("BBDMRunner", cfg6)
    stop_file = os.path.join(runner6.config.result.result_path, "STOP")
    if idx == 0:
        open(stop_file, "w").close()
    multihost_utils.sync_global_devices("stop_file_placed")
    runner6.train()  # returns normally on BOTH processes
    steps = np.asarray(multihost_utils.process_allgather(
        np.asarray([runner6.global_step])))
    assert np.all(steps == steps.ravel()[0]), f"stop step diverged: {steps}"
    assert runner6.global_step == 1, runner6.global_step
    if idx == 0:
        assert not os.path.exists(stop_file), "stop file must be consumed"
    gs_ckpt = os.path.join(runner6.config.result.ckpt_path, "last_model.ckpt")
    assert os.path.exists(gs_ckpt) == (idx == 0), (
        f"rank-0-only graceful-stop ckpt violated on proc {idx}")
    print(f"[proc {idx}] multi-host graceful stop ok at step {runner6.global_step}")

    # ---- lone-rank SIGTERM (round-4 advisor finding): SIGTERM delivered to
    # a NON-ZERO rank alone must not break that rank out of the collective
    # train loop (validation/ckpt fetches are collectives — a lone departure
    # is divergence/deadlock). The handler ignores the first delivery on
    # non-main ranks; rank-0's broadcast is the only stop decision. Both
    # ranks must therefore complete the full epoch in lockstep.
    import signal as _signal

    from bbdm_tpu.runners.bbdm import BBDMRunner

    class _LoneSigtermRunner(BBDMRunner):
        # next_rng is called once per train step, INSIDE train() where the
        # SIGTERM handler is installed — a deterministic mid-loop delivery
        # point (a timer thread would race handler installation)
        def next_rng(self):
            if idx == 1 and self.global_step == 0 and not getattr(
                    self, "_sig_sent", False):
                self._sig_sent = True
                os.kill(os.getpid(), _signal.SIGTERM)
            return super().next_rng()

    # 2 epochs x 1 step: with the pre-fix behavior rank 1 leaves the loop
    # after step 1 (its local stop_reason set) while rank 0 trains on —
    # the collective epoch validation then deadlocks/diverges
    cfg7 = make_config(root, os.path.join(root, "data"),
                       n_epochs=2, mesh_devices=None,
                       accumulate_grad_batches=1)
    cfg7.data.train.batch_size = 4
    cfg7.data.val.batch_size = 4
    cfg7.data.test.batch_size = 4
    cfg7.args = make_args(os.path.join(root, f"results_ls_p{idx}"),
                          save_top=False)
    runner7 = _LoneSigtermRunner(cfg7)
    runner7.train()  # must complete BOTH epochs on BOTH ranks (8 imgs / gb 8)
    steps = np.asarray(multihost_utils.process_allgather(
        np.asarray([runner7.global_step])))
    assert np.all(steps == steps.ravel()[0]), f"steps diverged: {steps}"
    assert runner7.global_step == 2, runner7.global_step
    assert runner7.stop_reason is None, (
        f"lone rank-{idx} SIGTERM must not set a stop: {runner7.stop_reason}")
    if idx == 1:
        assert runner7._sig_sent, "SIGTERM was never actually delivered"
    print(f"[proc {idx}] lone-rank SIGTERM ignored ok")


if __name__ == "__main__":
    main()
