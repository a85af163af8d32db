"""Offline xplane analysis: full op text + per-op FLOP/efficiency attribution.

Parses the trace already captured by scripts/profile_sampler.py (no TPU
needed), prints the top ops with untruncated HLO text so conv shapes can be
attributed, and estimates per-op MXU efficiency for conv fusions by parsing
the kernel operand shape out of the fusion text.

    python scripts/analyze_xplane.py [trace_dir] [top_n]
"""

from __future__ import annotations

import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from profile_sampler import self_times  # noqa: E402

V5E_BF16_PEAK = 197e12


def conv_flops(name: str) -> float | None:
    """FLOPs for a conv fusion, parsed from '= TYPE[out] fusion(TYPE[3,3,ci,co]'
    or from the output + a [3,3,ci,co] / [1,1,ci,co] operand anywhere."""
    out = re.search(r"= \(?(?:bf16|f32)\[([\d,]+)\]", name)
    w = re.search(r"(?:bf16|f32)\[(\d+),(\d+),(\d+),(\d+)\]\{3,2,1,0", name)
    if not out or not w:
        return None
    kh, kw, ci, co = (int(v) for v in w.groups())
    if kh > 8 or kw > 8:  # not a conv kernel operand
        return None
    out_dims = [int(v) for v in out.group(1).split(",")]
    if len(out_dims) == 2:  # stats tuple leading element [N, C]
        return None
    n, h, wd = out_dims[0], out_dims[1], out_dims[2]
    return 2.0 * n * h * wd * kh * kw * ci * co


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bbdm_prof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    latest = max(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")),
                 key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(latest, "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if p.name == "/device:TPU:0")
    self_ps, counts, ev_names = self_times(plane)

    total = sum(self_ps.values())
    print(f"total device self-time: {total/1e9:.1f} ms   ({latest})\n")
    for mid, ps in sorted(self_ps.items(), key=lambda kv: -kv[1])[:top_n]:
        name = ev_names.get(mid, "?")
        per_call_s = ps / counts[mid] / 1e12
        fl = conv_flops(name)
        eff = f" eff={fl / per_call_s / V5E_BF16_PEAK * 100:5.1f}%" if fl else ""
        print(f"{ps/1e9:8.1f} ms x{counts[mid]:6d} {per_call_s*1e3:7.3f} ms/call"
              f"{eff}\n    {name[:400]}\n")


if __name__ == "__main__":
    main()
