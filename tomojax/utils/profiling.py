"""Profiling and timing instrumentation.

Replaces the reference's debug wall-clock prints (``sirt.py:80-82``,
``sirt_mpi.py:142-144``) with jax.profiler traces and synchronized timers
(xprof-compatible; view with TensorBoard or Perfetto)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, reps: int = 1, warmup: int = 1, **kwargs):
    """Synchronized timing: returns (last_result, seconds_per_call).

    block_until_ready after every call so device work is counted (the
    reference times unsynchronized Python wall-clock)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / max(reps, 1)


class IterationTimer:
    """Accumulates per-iteration wall times for host-side loops."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def total(self):
        return sum(self.times)

    @property
    def mean(self):
        return self.total / max(len(self.times), 1)
