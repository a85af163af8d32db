"""XLA flag sweep for the sampling bench (VERDICT r1 next-step #4).

Runs bench.py in a fresh subprocess per flag set (serially — one TPU client
at a time) and prints a ranking. Default BENCH_STEPS=50 keeps per-config
compile time tolerable while preserving the per-step cost that dominates the
200-step north-star; confirm the winner at 200 steps afterwards.

    python scripts/bench_flags.py
    BENCH_STEPS=200 python scripts/bench_flags.py   # full-length confirm
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAG_SETS = {
    "baseline": "",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "scoped_vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "lhs+vmem": ("--xla_tpu_enable_latency_hiding_scheduler=true "
                 "--xla_tpu_scoped_vmem_limit_kib=65536"),
}


def run(name, flags):
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    env.setdefault("BENCH_STEPS", "50")
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
    for name, flags in FLAG_SETS.items():
        d = run(name, flags)
        if d:
            results[name] = d["value"]
    ranked = sorted(results.items(), key=lambda kv: -kv[1])
    print(json.dumps({"steps": os.environ.get("BENCH_STEPS", "50"),
                      "ranking": ranked}))


if __name__ == "__main__":
    main()
