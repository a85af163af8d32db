"""bbdm_tpu CLI — flag-compatible with the reference's `main.py:14-54`.

    python main.py -c configs/Template-LBBDM-f4.yaml --train
    python main.py -c configs/Template-LBBDM-f4.yaml --sample_to_eval \
        --resume_model path/to/last_model.ckpt

Deviations (TPU-native):
  * --gpu_ids: JAX discovers all local TPU chips automatically and trains
    data-parallel over a device mesh; `--gpu_ids -1` forces the CPU backend,
    and `--gpu_ids 0,2` restricts the mesh to that local-device subset (the
    reference spawns one DDP process per listed GPU, main.py:100-104).
  * --port: accepted, unused (no NCCL rendezvous; multi-host initialization is
    `jax.distributed.initialize()` driven by the TPU runtime environment).
"""

from __future__ import annotations

import argparse


def parse_args():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--config", type=str, default="BB_base.yml",
                        help="Path to the config file")
    parser.add_argument("-s", "--seed", type=int, default=1234, help="Random seed")
    parser.add_argument("-r", "--result_path", type=str, default="results",
                        help="The directory to save results")

    parser.add_argument("-t", "--train", action="store_true", default=False,
                        help="train the model")
    parser.add_argument("--sample_to_eval", action="store_true", default=False,
                        help="sample for evaluation")
    parser.add_argument("--sample_at_start", action="store_true", default=False,
                        help="sample at start(for debug)")
    parser.add_argument("--save_top", action="store_true", default=False,
                        help="save top loss checkpoint")

    parser.add_argument("--gpu_ids", type=str, default="0",
                        help="-1 forces CPU; a comma list (e.g. 0,2) restricts "
                             "the mesh to that local-device subset; default uses "
                             "all local TPU chips")
    parser.add_argument("--port", type=str, default="12355", help="compat flag (unused)")

    parser.add_argument("--resume_model", type=str, default=None, help="model checkpoint")
    parser.add_argument("--resume_optim", type=str, default=None, help="optimizer checkpoint")

    parser.add_argument("--max_epoch", type=int, default=None, help="cap training.n_epochs")
    parser.add_argument("--max_steps", type=int, default=None, help="cap training.n_steps")
    return parser.parse_args()


def main():
    import os

    args = parse_args()

    if args.gpu_ids == "-1":  # CPU path (reference main.py:112-115)
        import jax

        jax.config.update("jax_platforms", "cpu")

    # multi-host TPU slices: coordinator discovery comes from the TPU runtime
    # environment, or from BBDM_COORDINATOR/... env vars for CPU testing
    # (replaces the reference's NCCL localhost rendezvous)
    from bbdm_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()

    # BBDM_BACKEND_WAIT=<seconds>: wait out transient TPU-service
    # unavailability (client-claim expiry, service restart) instead of
    # crashing at startup; default off = fail fast like the reference
    backend_wait = float(os.environ.get("BBDM_BACKEND_WAIT", "0"))
    if backend_wait > 0:
        from bbdm_tpu.utils.backend import wait_for_backend

        wait_for_backend(backend_wait)

    # persistent compilation cache: restarts/resumes skip recompiling the
    # train step and sampler (disable with BBDM_JAX_CACHE=0)
    if os.environ.get("BBDM_JAX_CACHE", "1") != "0":
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/bbdm_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bbdm_tpu.config import apply_cli_overrides, load_config
    from bbdm_tpu.registry import get_runner

    config = load_config(args.config)
    config = apply_cli_overrides(config, args)

    # seed note: jax PRNG is explicit — the seed threads through the runner
    runner = get_runner(config.runner, config)
    if args.train:
        runner.train()
    else:
        runner.test()


if __name__ == "__main__":
    main()
