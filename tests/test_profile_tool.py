"""Unit test for scripts/profile_sampler.self_times — the nested-interval
self-time pass that powers the perf breakdowns in BENCH_NOTES.md."""

import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from profile_sampler import self_times  # noqa: E402


class _Event:
    def __init__(self, offset, duration, mid):
        self.offset_ps = offset
        self.duration_ps = duration
        self.metadata_id = mid


def _plane(events, names):
    plane = types.SimpleNamespace()
    plane.event_metadata = {
        i: types.SimpleNamespace(name=n) for i, n in names.items()}
    line = types.SimpleNamespace(name="XLA Ops", events=events)
    plane.lines = [line]
    return plane


def test_self_time_subtracts_nested_children():
    # parent [0, 100) wraps child A [10, 30) which wraps grandchild [15, 20);
    # sibling child B [40, 90)
    events = [
        _Event(0, 100, 1),   # parent: self = 100 - 20 - 50 = 30
        _Event(10, 20, 2),   # child A: self = 20 - 5 = 15
        _Event(15, 5, 3),    # grandchild: self = 5
        _Event(40, 50, 2),   # child B (same metadata as A): self = 50
    ]
    plane = _plane(events, {1: "while", 2: "fusion.1", 3: "copy.2"})
    self_ps, counts, names = self_times(plane)
    assert self_ps[1] == 30
    assert self_ps[2] == 15 + 50
    assert self_ps[3] == 5
    assert counts[2] == 2
    # total self time == wall of the outermost interval
    assert sum(self_ps.values()) == 100


def test_self_time_disjoint_roots():
    events = [_Event(0, 10, 1), _Event(20, 10, 1), _Event(22, 4, 2)]
    plane = _plane(events, {1: "fusion.9", 2: "reduce.3"})
    self_ps, counts, _ = self_times(plane)
    assert self_ps[1] == 10 + 6
    assert self_ps[2] == 4
    assert counts[1] == 2
