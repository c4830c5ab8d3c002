"""Profiling / tracing hooks (capability the reference lacks — SURVEY.md §5).

``trace(path)`` wraps a region in a jax.profiler trace (viewable in TensorBoard /
Perfetto); ``StepTimer`` gives blocking per-step wall timings with warmup discard.
"""

from __future__ import annotations

import contextlib
import time
from typing import List

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sml_tpu_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a trace (host-side annotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Blocking step timer: ``with timer.step(): ...`` ; stats skip warmup steps."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []

    @contextlib.contextmanager
    def step(self, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.times.append(time.perf_counter() - t0)

    def stats(self) -> dict:
        import numpy as np

        t = np.asarray(self.times[self.warmup:] or self.times)
        return {"mean_ms": float(t.mean() * 1e3), "p50_ms": float(np.median(t) * 1e3),
                "min_ms": float(t.min() * 1e3), "max_ms": float(t.max() * 1e3),
                "steps": len(t)}
