"""Driver entry points stay functional: dryrun_multichip on a virtual mesh."""

import subprocess
import sys

import pytest


@pytest.mark.slow
def test_dryrun_multichip_4_devices():
    script = (
        "import os;"
        "os.environ['XLA_FLAGS']=' --xla_force_host_platform_device_count=4"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import __graft_entry__ as g; g.dryrun_multichip(4)"
    )
    res = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=1200, cwd="/root/repo")
    assert "dryrun_multichip(4): pixel ok" in res.stdout, res.stderr[-2000:]
    assert "dryrun_multichip(4): latent ok" in res.stdout, res.stderr[-2000:]


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    """The driver calls dryrun_multichip bare on a 1-device host (round-1
    failure, MULTICHIP_r01.json): the entry must re-exec itself with a
    virtual CPU mesh. Simulate the 1-device host with a 1-device CPU parent
    (not the real TPU — one TPU client at a time)."""
    script = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import __graft_entry__ as g; g.dryrun_multichip(4)"
    )
    res = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=1200, cwd="/root/repo",
                         env={"PATH": "/usr/bin:/bin:/usr/local/bin"})
    assert "dryrun_multichip(4): pixel ok" in res.stdout, res.stderr[-2000:]
    assert "dryrun_multichip(4): latent ok" in res.stdout, res.stderr[-2000:]
