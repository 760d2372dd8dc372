"""Profiling hooks: jax.profiler traces + named scopes.

Equivalent of the reference's profiling surface (SURVEY.md §5.1:
runSessionWithCallBackInfo per-op tables, timeProfile.cpp, MNN_GPU_TIME_PROFILE):
on TPU the per-op story is xprof — `trace()` wraps any region and writes a
TensorBoard-loadable trace; `annotate()` names model stages so kernels
group by phase in the timeline (≈ OperatorInfo names).
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(logdir: str = "/tmp/mnn_tpu_trace"):
    """Capture a jax/xprof trace of the enclosed region."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for kernels launched inside (shows up in xprof)."""
    import jax

    return jax.named_scope(name)


class StageTimer:
    """Host-side per-stage wall clock aggregation (≈ Profiler.cpp tables)."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        total = sum(self.totals.values()) or 1.0
        lines = [f"{'stage':<24}{'total_s':>10}{'calls':>8}{'avg_ms':>10}{'%':>7}"]
        for name, t in rows:
            n = self.counts[name]
            lines.append(
                f"{name:<24}{t:>10.3f}{n:>8}{t / n * 1e3:>10.2f}"
                f"{t / total * 100:>6.1f}%"
            )
        return "\n".join(lines)
