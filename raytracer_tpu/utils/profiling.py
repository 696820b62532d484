"""Tracing / profiling / metrics.

The reference has no integrated profiling — its Timer helper is dead
code (Core/TimeHelper.h, never instantiated) and the README perf claim
was hand-measured (SURVEY.md §5 "Tracing"). Here:

  * `trace(path)` wraps `jax.profiler` for TensorBoard-viewable device
    traces of render/train steps,
  * `Meter` measures wall-clock + derived rays/s the same way the
    benchmark harness does (camera rays = W·H·spp; segments estimated
    from mean path length),
  * `log_metrics` is the single structured-logging choke point.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace context (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Meter:
    def __init__(self, width: int, height: int, spp: int):
        self.width, self.height, self.spp = width, height, spp
        self.t0 = None
        self.elapsed = None

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False

    @property
    def camera_rays(self) -> int:
        return self.width * self.height * self.spp

    @property
    def rays_per_sec(self) -> float:
        return self.camera_rays / self.elapsed if self.elapsed else 0.0


def log_metrics(tag: str, stream=None, **metrics) -> None:
    rec = {"tag": tag, "time": time.time(), **metrics}
    print(json.dumps(rec), file=stream or sys.stderr)
