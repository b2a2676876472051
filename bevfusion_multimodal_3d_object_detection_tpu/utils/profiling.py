"""Tracing/profiling hooks — a first-class subsystem the reference only stubs
(`debug.profile`, `metrics.speed.*` exist in configs/base.yaml:465-471,643 but
are never read; SURVEY.md §5).

- `profile_trace(logdir)`: context manager around `jax.profiler` producing a
  TensorBoard-loadable trace of device execution.
- `StepTimer`: wall-clock per-step timing with warmup discard and percentile
  summary (fps / latency, the declared-but-dead `metrics.speed` keys).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def profile_trace(logdir: str = "./logs/profile"):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    def summary(self, batch_size: int = 1) -> Dict[str, float]:
        import numpy as np

        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "mean_latency_ms": float(t.mean() * 1e3),
            "p50_latency_ms": float(np.percentile(t, 50) * 1e3),
            "p95_latency_ms": float(np.percentile(t, 95) * 1e3),
            "fps": float(batch_size / t.mean()),
            "steps": len(self.times),
        }


def device_memory_stats() -> Dict[str, int]:
    """Peak/available HBM per device when the backend exposes it
    (the declared-but-dead `metrics.memory.*` keys)."""
    import jax

    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use", 0),
                "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
                "bytes_limit": s.get("bytes_limit", 0),
            }
        except Exception:
            pass
    return stats
