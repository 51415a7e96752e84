"""Profiling & latency reporting.

Covers the reference's three ad-hoc mechanisms (SURVEY.md §5.1) with
first-class equivalents:
  * speed.log per-rollout wall clock -> SpeedLog (same file format as
    infer/visualize.generation_speed_log)
  * measure_time.py micro-benchmarks -> timeit() helper
  * torchviz graph PNG -> jax.profiler traces (xprof-compatible) via
    trace() and annotate()
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax


class SpeedLog:
    """Append per-sample generation wall-clock like the reference
    (visualize_metaformer.py:116-127)."""

    def __init__(self, path: str = "speed.log", reset: bool = True):
        self.path = path
        if reset:
            open(path, "w", encoding="utf-8").close()

    def record(self, seconds: float, frames: int) -> None:
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(
                f"{seconds:.6f} sec / {frames} frames "
                f"({frames / max(seconds, 1e-9):.1f} frames/s)\n"
            )


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside jitted code (shows up in traces)."""
    return jax.profiler.TraceAnnotation(name)


def timeit(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Median wall-clock seconds of fn(*args) with device sync."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
