"""XLA compiler-option sweep for the sampling bench.

TPU-specific flags CANNOT go through XLA_FLAGS here: the axon tunnel's
client-side XLA build doesn't know libtpu flags and aborts on them
("Unknown flag in XLA_FLAGS"). Options must ride PJRT CompileOptions —
bench.py's BBDM_XLA_OPTS knob does that via jit(...).lower().compile(
compiler_options=...), which the remote compile service validates (a bogus
option is rejected with HTTP 500, so accepted options provably reach the
real compiler).

Runs bench.py in a fresh subprocess per option set (serially — one TPU
client at a time) and prints a ranking.

    python scripts/bench_flags.py
    BENCH_STEPS=50 python scripts/bench_flags.py   # quicker per-config runs
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OPTION_SETS = {
    "baseline": "",
    "latency_hiding": "xla_tpu_enable_latency_hiding_scheduler=true",
}
# measured round 2 (BENCH_NOTES): scoped_vmem 64m/32m both negative
# ("scoped_vmem_64m": "xla_tpu_scoped_vmem_limit_kib=65536")


def run(name, opts):
    env = dict(os.environ)
    if opts:
        env["BBDM_XLA_OPTS"] = opts
    res = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=3600)
    line = None
    for out_line in res.stdout.splitlines():
        out_line = out_line.strip()
        if out_line.startswith("{"):
            line = out_line
    if res.returncode != 0 or line is None:
        print(f"[{name}] FAILED rc={res.returncode}\n{res.stderr[-1500:]}",
              file=sys.stderr)
        return None
    d = json.loads(line)
    print(f"[{name}] {d['value']} {d['unit']}  "
          f"(achieved {d['detail']['achieved_tflops']} TFLOP/s)", flush=True)
    return d


def main():
    results = {}
    for name, opts in OPTION_SETS.items():
        d = run(name, opts)
        if d:
            results[name] = d["value"]
    ranked = sorted(results.items(), key=lambda kv: -kv[1])
    print(json.dumps({"steps": os.environ.get("BENCH_STEPS", "200"),
                      "ranking": ranked}))


if __name__ == "__main__":
    main()
