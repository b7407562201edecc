"""Profiling / observability.

The reference has no kernel timing at all (SURVEY.md section 5 —
progress bars only); this module provides the benchmark-harness
counterpart required by BASELINE: wall-clock step timers with summary
statistics, an optional JAX profiler trace context (TensorBoard-viewable
when the backend supports it), and a renders/sec helper used by the
bench suite.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class StepTimer:
    """Collects wall-times per named phase; `summary()` gives
    count/mean/p50/p90/max in milliseconds."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self.times.items():
            s = sorted(ts)
            n = len(s)
            out[name] = {
                "count": n,
                "mean_ms": 1e3 * sum(s) / n,
                "p50_ms": 1e3 * s[n // 2],
                "p90_ms": 1e3 * s[min(n - 1, int(0.9 * n))],
                "max_ms": 1e3 * s[-1],
            }
        return out


@contextlib.contextmanager
def jax_trace(log_dir: Optional[str]):
    """jax.profiler.trace context; no-op when log_dir is None or the
    backend rejects profiling (remote tunnels may)."""
    if log_dir is None:
        yield
        return
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:
        yield


def throughput(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Calls/sec of a blocking callable (block_until_ready'd outputs)."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return iters / (time.perf_counter() - t0)
