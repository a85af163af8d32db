"""wait_for_backend (utils/backend.py): retry semantics for transient TPU
client-initialization failures (BBDM_BACKEND_WAIT CLI knob)."""

import pytest

from bbdm_tpu.utils.backend import wait_for_backend

UNAVAILABLE = RuntimeError(
    "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend "
    "setup/compile error (Unavailable)."
)


class FlakyProbe:
    def __init__(self, failures, err=UNAVAILABLE, value=8):
        self.failures, self.err, self.value = failures, err, value
        self.calls = 0

    def __call__(self):
        self.calls += 1
        if self.calls <= self.failures:
            raise self.err
        return self.value


def test_retries_transient_then_returns():
    probe = FlakyProbe(failures=2)
    slept = []
    n = wait_for_backend(600, interval_sec=60,
                         probe=probe, sleep=slept.append, log=lambda *_: None)
    assert n == 8
    assert probe.calls == 3
    assert slept == [60, 60]


def test_budget_exhausted_reraises():
    probe = FlakyProbe(failures=99)
    slept = []
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        wait_for_backend(120, interval_sec=60,
                         probe=probe, sleep=slept.append, log=lambda *_: None)
    # attempts at waited=0,60,120 -> raise on the waited==120 failure
    assert probe.calls == 3
    assert slept == [60, 60]


def test_non_transient_runtime_error_fails_fast():
    probe = FlakyProbe(failures=5, err=RuntimeError("donated buffer aliased"))
    slept = []
    with pytest.raises(RuntimeError, match="donated"):
        wait_for_backend(600, probe=probe, sleep=slept.append,
                         log=lambda *_: None)
    assert probe.calls == 1 and slept == []


def test_non_runtime_error_propagates():
    def probe():
        raise ValueError("bad config")

    with pytest.raises(ValueError):
        wait_for_backend(600, probe=probe, sleep=lambda _: None,
                         log=lambda *_: None)


def test_immediate_success_no_log(capsys):
    assert wait_for_backend(600, probe=lambda: 1) == 1
    assert capsys.readouterr().out == ""
