"""Multi-host initialization (replaces the reference's NCCL localhost
rendezvous, `/root/reference/main.py:68-80`).

On TPU pods ``jax.distributed.initialize()`` discovers the coordinator from
the TPU runtime environment. For CPU testing (and generic clusters) the
rendezvous can be pinned explicitly with env vars:

    BBDM_MULTIHOST=1               enable multi-host init
    BBDM_COORDINATOR=host:port     (optional) coordinator address
    BBDM_NUM_PROCESSES=N           (optional, with BBDM_COORDINATOR)
    BBDM_PROCESS_ID=i              (optional, with BBDM_COORDINATOR)
"""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Call jax.distributed.initialize() when BBDM_MULTIHOST=1. Returns
    whether initialization ran. Must be called before any other jax use."""
    if os.environ.get("BBDM_MULTIHOST") != "1":
        return False
    import jax

    coordinator = os.environ.get("BBDM_COORDINATOR")
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ["BBDM_NUM_PROCESSES"]),
            process_id=int(os.environ["BBDM_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()
    return True
