"""Backend-availability wait — operational hardening, no reference equivalent
(the reference assumes `cuda:0` is always up, e.g. `main.py:89-97`).

A TPU client can fail initialization with a transient ``UNAVAILABLE`` while
the device service restarts or a previous client's server-side claim expires
(observed 40-75 min on this host — BENCH_NOTES round 3). A production
launcher should wait that window out instead of crashing at startup:
``wait_for_backend`` retries JAX backend initialization on transient init
errors until a time budget is exhausted. JAX only memoizes *successful*
backend construction (``jax/_src/xla_bridge.py`` caches into ``_backends``
on success and raises without caching on failure), so re-probing in-process
genuinely re-attempts initialization.

Wired into the CLI via ``BBDM_BACKEND_WAIT=<seconds>`` (default off:
fail fast, matching the reference's behavior).
"""

from __future__ import annotations

import time


def _default_probe():
    import jax

    return jax.device_count()


def wait_for_backend(max_wait_sec: float, *, interval_sec: float = 60.0,
                     probe=None, sleep=time.sleep, log=print) -> int:
    """Block until the JAX backend initializes; return the device count.

    Retries only plausibly-transient initialization failures (RuntimeError
    carrying ``UNAVAILABLE`` or the xla_bridge "Unable to initialize backend"
    wrapper); anything else — and the transient error once ``max_wait_sec``
    has been slept away — propagates to the caller.

    ``probe``/``sleep``/``log`` are injectable for tests.
    """
    if probe is None:
        probe = _default_probe
    waited = 0.0
    attempt = 0
    while True:
        attempt += 1
        try:
            n = probe()
            if attempt > 1:
                log(f"[backend] available after {attempt} attempts "
                    f"(~{int(waited)}s waited)")
            return n
        except RuntimeError as e:
            msg = str(e)
            transient = ("UNAVAILABLE" in msg
                         or "Unable to initialize backend" in msg)
            if not transient or waited >= max_wait_sec:
                raise
            log(f"[backend] init failed ({msg.splitlines()[0][:120]}); "
                f"retrying in {interval_sec:.0f}s "
                f"({int(waited)}/{int(max_wait_sec)}s waited)")
            sleep(interval_sec)
            waited += interval_sec
