"""bench.py harness self-checks (CPU).

bench.py is the driver's round-end artifact generator; its backend-init
retry path exists because the axon tunnel both *errors* (RuntimeError:
Unable to initialize backend — round-3 postmortem) and *hangs* (PJRT
make_c_api_client blocking forever — observed 2026-08-18). These tests pin
the hang->retryable-error conversion and that the wrapper preserves an
outer watchdog alarm (scripts/r4_driver.py wraps stages in SIGALRM)."""

import signal
import time

import pytest

import bench


def test_init_backend_returns_platform():
    assert bench._init_backend_with_timeout() == "cpu"


def test_init_backend_preserves_outer_alarm():
    fired = []
    old = signal.signal(signal.SIGALRM, lambda s, f: fired.append(1))
    try:
        signal.alarm(30)
        bench._init_backend_with_timeout(timeout_s=5)
        remaining = signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)
    assert 1 <= remaining <= 30
    assert not fired


def test_init_backend_timeout_raises_retryable(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "devices", lambda: time.sleep(10))
    with pytest.raises(RuntimeError, match="nable to initialize backend"):
        bench._init_backend_with_timeout(timeout_s=1)
    # The alarm must be disarmed after the failure path too.
    assert signal.alarm(0) == 0
