"""Profiling/observability — a first-class subsystem the reference lacks
(SURVEY.md §5: closest artifact is an nvidia-smi print).

StepTimer keeps a rolling window of step wall-times; `trace` wraps
`jax.profiler.trace` for on-demand XLA traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque


class StepTimer:
    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    @property
    def mean_ms(self) -> float:
        return 1e3 * sum(self.times) / len(self.times) if self.times else 0.0

    def summary(self) -> str:
        if not self.times:
            return "no steps"
        return f"{self.mean_ms:.1f} ms/step, {1e3 / self.mean_ms:.2f} steps/s"


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/or4d_trace"):
    """XLA profiler trace around a block; view with tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
