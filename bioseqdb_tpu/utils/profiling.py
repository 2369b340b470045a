"""Tracing, profiling, and throughput metrics.

The reference has no observability at all (SURVEY.md §5 — an unused
<chrono> include). Here: jax.profiler trace capture (Perfetto/XPlane,
viewable in TensorBoard or ui.perfetto.dev) plus lightweight per-stage
wall-clock/throughput counters — reads/s *is* the north-star metric, so
the pipeline reports it natively.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def device_trace(trace_dir: str):
    """Capture a device trace for the enclosed block (jax.profiler)."""
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StageTimer:
    """Accumulates wall-clock + item counts per pipeline stage."""

    times: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, n_items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + n_items

    def report(self, fh=sys.stderr) -> dict:
        out = {}
        for name, t in self.times.items():
            n = self.counts.get(name, 0)
            out[name] = {
                "seconds": round(t, 4),
                "items": n,
                "items_per_s": round(n / t, 1) if t > 0 and n else None,
            }
        print(json.dumps({"stages": out}), file=fh, flush=True)
        return out
