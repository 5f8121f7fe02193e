"""Profiling / tracing helpers (SURVEY.md §5: the reference had only
wall-clock prints; rebuild obligation is jax.profiler traces + throughput
counters)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when logdir is None.

    View with TensorBoard's profile plugin or xprof.
    """
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Steps/sec + leapfrogs/sec counter for device-resident loops.

    Call ``tick(n_steps)`` after each dispatched chunk (blocks on device).
    """

    def __init__(self, n_chains: int, leapfrogs_per_step: int):
        self.n_chains = n_chains
        self.leapfrogs_per_step = leapfrogs_per_step
        self.steps = 0
        self.t0 = time.perf_counter()

    def tick(self, n_steps: int, block_on=None) -> None:
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.steps += n_steps

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def steps_per_sec(self) -> float:
        return self.steps / max(self.elapsed, 1e-9)

    @property
    def leapfrogs_per_sec(self) -> float:
        """Chain-leapfrog steps per second (the BASELINE.json metric)."""
        return self.steps_per_sec * self.leapfrogs_per_step * self.n_chains
