"""Profiling and per-step timing (the reference has none — SURVEY.md §5).

Two tools:

* :func:`profile_trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace (XLA op breakdown, HBM usage) for any code
  region. Enabled in the Trainer via ``config.profile_dir`` /
  ``[training] profile_dir=...``.
* :class:`StepTimer` — lightweight host-side step timer with percentile
  summaries, used for per-epoch ``examples_per_sec`` and p50/p99 step times
  in ``log.csv``.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """Trace the enclosed region with jax.profiler (no-op if logdir falsy)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with percentile summary."""

    def __init__(self):
        self._times: list[float] = []
        self._last: float | None = None

    def start(self):
        self._last = time.time()

    def stop(self):
        if self._last is not None:
            self._times.append(time.time() - self._last)
            self._last = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> dict:
        if not self._times:
            return {}
        t = np.asarray(self._times) * 1000.0
        return {
            "steps": len(t),
            "step_ms_p50": float(np.percentile(t, 50)),
            "step_ms_p99": float(np.percentile(t, 99)),
            "step_ms_mean": float(t.mean()),
        }

    def reset(self):
        self._times.clear()
        self._last = None
