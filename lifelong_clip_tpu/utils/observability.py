"""Tracing / profiling / step-timing observability.

The reference ships a ``--profile`` flag that nothing reads and wall-clock
logging only (SURVEY §5.1). Here profiling is first-class:

  * ``StepTimer`` — per-step latency EMA + percentiles, cheap enough for
    the hot loop, with honest device synchronization (a value fetch —
    ``block_until_ready`` can return early through tunneled backends);
  * ``profile_trace`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace directory;
  * ``log_compile_time`` — wraps the first invocation of a jitted fn.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, List

import numpy as np

log = logging.getLogger("lifelong_clip_tpu")


class StepTimer:
    """Rolling step-latency stats. Call ``tick()`` around each step."""

    def __init__(self, window: int = 256):
        self.window = window
        self.samples: List[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is None:
            return
        self.samples.append(time.perf_counter() - self._t0)
        if len(self.samples) > self.window:
            self.samples.pop(0)
        self._t0 = None

    @contextlib.contextmanager
    def tick(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        a = np.asarray(self.samples) * 1e3
        return {"p50_ms": float(np.percentile(a, 50)),
                "p90_ms": float(np.percentile(a, 90)),
                "p99_ms": float(np.percentile(a, 99)),
                "mean_ms": float(a.mean())}


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """jax.profiler trace around a region (TensorBoard 'profile' plugin)."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", logdir)


def log_compile_time(fn, name: str):
    """Wrap a jitted fn; logs wall time of the first (compiling) call."""
    state = {"first": True}

    def wrapped(*args, **kwargs):
        if state["first"]:
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            log.info("%s: first call (compile) took %.2fs", name,
                     time.perf_counter() - t0)
            state["first"] = False
            return out
        return fn(*args, **kwargs)

    return wrapped
