"""Tracing / profiling utilities.

The reference tracks wall-clock stage timings only (SURVEY.md §5.1 —
src/retrieval_pipeline.py:531-606). The TPU build keeps that timing
dict shape and adds what the reference lacks:

* ``jax.profiler`` trace capture (``trace`` context manager) producing
  TensorBoard-loadable traces,
* device-time vs host-time split for a jitted callable
  (``device_host_split``) using on-device chained loops to isolate
  device execution from dispatch overhead,
* a lightweight ``StageTimer`` with EMA + percentile summaries.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Any, Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tristage_trace", enabled: bool = True):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_host_split(
    fn: Callable[..., Any],
    *args,
    iters: int = 10,
) -> dict[str, float]:
    """Estimate device-time vs host(dispatch)-time for ``fn(*args)``.

    host_total: wall time per blocking call.
    device_est: marginal per-iteration time when iterations are chained
    on device (the dispatch/RTT overhead differences out).
    """
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    host_total = (time.perf_counter() - t0) / iters

    t1 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    pipelined = (time.perf_counter() - t1) / iters
    return {
        "host_time_s": host_total,
        "pipelined_time_s": pipelined,
        "dispatch_overhead_s": max(host_total - pipelined, 0.0),
    }


class StageTimer:
    """Per-stage latency collection with EMA and percentiles."""

    def __init__(self, window: int = 1000):
        self.window = window
        self._samples: dict[str, list[float]] = {}
        self.ema: dict[str, float] = {}
        self._alpha = 0.1

    @contextlib.contextmanager
    def measure(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.record(stage, dt)

    def record(self, stage: str, seconds: float) -> None:
        buf = self._samples.setdefault(stage, [])
        buf.append(seconds)
        if len(buf) > self.window:
            del buf[: len(buf) - self.window]
        prev = self.ema.get(stage)
        self.ema[stage] = (
            seconds if prev is None else (1 - self._alpha) * prev + self._alpha * seconds
        )

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for stage, buf in self._samples.items():
            if not buf:
                continue
            s = sorted(buf)
            out[stage] = {
                "count": len(s),
                "mean_ms": statistics.fmean(s) * 1e3,
                "ema_ms": self.ema[stage] * 1e3,
                "p50_ms": s[len(s) // 2] * 1e3,
                "p95_ms": s[min(int(len(s) * 0.95), len(s) - 1)] * 1e3,
                "p99_ms": s[min(int(len(s) * 0.99), len(s) - 1)] * 1e3,
            }
        return out
