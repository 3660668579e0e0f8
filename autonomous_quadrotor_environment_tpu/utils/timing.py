"""Step timing / profiling helpers.

Capability match for the reference's ad-hoc wall-clock timers
(reference: ppo.py:386-390 update timing, ppo_forward_time.py:71-77 forward
latency sweep, quadrotor_cv.py:58,104 CV timing) — one Timer that
`block_until_ready`s its operands so TPU async dispatch doesn't lie, plus
an optional jax.profiler trace context.
"""

from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    def __init__(self):
        self.times: list[float] = []

    @contextlib.contextmanager
    def measure(self, *block_on):
        t0 = time.perf_counter()
        yield
        if block_on:
            jax.block_until_ready(block_on)
        self.times.append(time.perf_counter() - t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def last(self) -> float:
        return self.times[-1] if self.times else 0.0


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context (TPU timeline in TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
