"""Profile the 200-step sampler on the TPU chip and print a self-time
breakdown by op category (the tooling behind BENCH_NOTES.md).

    python scripts/profile_sampler.py            # full 200-step, batch 8
    BENCH_STEPS=20 BENCH_BATCH=2 python scripts/profile_sampler.py

Writes the raw trace under /tmp/bbdm_prof (inspectable with TensorBoard's
profile plugin elsewhere) and parses the .xplane.pb locally — the image's
tensorboard_plugin_profile converter is protobuf-version-broken, so the
nesting/self-time pass is done here directly on the XSpace proto.
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp


def op_symbol(name: str) -> str:
    """The defining op symbol with trailing numbering stripped, e.g.
    '%convert_add_fusion.60 = f32[...] fusion(...)' -> 'convert_add_fusion'.

    Classification MUST use this, not the full event text: HLO names embed
    operand names, so substring checks against the whole line mis-bucket
    (a fusion whose operand is %copy-done.7 is not a copy)."""
    m = re.match(r"%?([a-zA-Z_\-\.]+)", name.split(" = ")[0])
    return re.sub(r"\.\d*$", "", m.group(1)) if m else "?"


def categorize(name: str) -> str:
    sym = op_symbol(name)
    if "convert_reduce" in sym:
        return "groupnorm-stats (convert_reduce)"
    if "convolution" in sym:
        return "convolution"
    if sym == "fusion":
        return "fusion (conv/elementwise)"
    if "copy" in sym:
        return "copy (layout/VMEM staging)"
    if "while" in sym or "jit_" in sym:
        return "control"
    if "dot" in sym:
        return "dot"
    if "dynamic" in sym or "slice" in sym:
        return "slice/dynamic-update"
    if "reduce" in sym:
        return "reduce"
    if "rng" in sym or "threefry" in sym:
        return "rng"
    return sym


def self_times(plane):
    """Self time (duration minus nested children) per event-metadata id, from
    the nested-interval 'XLA Ops' line."""
    ev_names = {i: m.name for i, m in plane.event_metadata.items()}
    line = next(l for l in plane.lines if l.name == "XLA Ops")
    evs = sorted(((e.offset_ps, e.offset_ps + e.duration_ps, e.metadata_id)
                  for e in line.events), key=lambda t: (t[0], -t[1]))
    self_ps = collections.Counter()
    counts = collections.Counter()
    stack = []  # [start, end, mid, child_accum]

    def close(upto):
        while stack and stack[-1][1] <= upto:
            start, end, mid, child = stack.pop()
            dur = end - start
            self_ps[mid] += dur - child
            if stack:
                stack[-1][3] += dur

    for off, end, mid in evs:
        close(off)
        counts[mid] += 1
        stack.append([off, end, mid, 0])
    close(float("inf"))
    return self_ps, counts, ev_names


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/bbdm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    config_path = os.environ.get("BENCH_CONFIG", "configs/Template-LBBDM-f4.yaml")

    from bbdm_tpu.config import load_config
    from bbdm_tpu.models import build_model

    config = load_config(config_path)
    if "BENCH_STEPS" in os.environ:
        config.model.BB.params.sample_step = int(os.environ["BENCH_STEPS"])
    model = build_model(config.model)
    params = model.init_params(jax.random.PRNGKey(0))

    # named like bench.py's jitted fn so both share a persistent-cache entry
    def sample_fn(params, rng, x_cond):
        return model.sample(params, rng, x_cond, clip_denoised=False).mean()

    fn = jax.jit(sample_fn)
    x = jnp.zeros((batch, 256, 256, 3), jnp.float32)
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    float(fn(params, rng, x))
    print(f"warmup/compile: {time.time() - t0:.1f}s", file=sys.stderr)

    trace_dir = os.environ.get("BBDM_PROF_DIR", "/tmp/bbdm_prof")
    with jax.profiler.trace(trace_dir):
        float(fn(params, jax.random.fold_in(rng, 1), x))

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

    latest = max(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")),
                 key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(latest, "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if p.name == "/device:TPU:0")
    self_ps, counts, ev_names = self_times(plane)

    bycat = collections.Counter()
    ccat = collections.Counter()
    for mid, ps in self_ps.items():
        cat = categorize(ev_names.get(mid, "?"))
        bycat[cat] += ps
        ccat[cat] += counts[mid]
    total = sum(bycat.values())
    print(f"device self-time total: {total / 1e9:.1f} ms   ({latest})")
    for cat, ps in bycat.most_common(16):
        print(f"  {ps / 1e9:9.1f} ms ({100 * ps / total:4.1f}%) x{ccat[cat]:7d}  {cat}")

    top_n = int(os.environ.get("BBDM_PROF_TOP", "0"))
    if top_n:
        print(f"\ntop {top_n} individual ops by self-time:")
        for mid, ps in sorted(self_ps.items(), key=lambda kv: -kv[1])[:top_n]:
            name = ev_names.get(mid, "?")
            print(f"  {ps / 1e9:9.1f} ms x{counts[mid]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
