"""Profiling hooks (net-new capability — the reference has none, SURVEY.md 5).

Wraps the JAX profiler (XLA trace viewable in TensorBoard/Perfetto) plus a
lightweight step timer that separates host input time from device step time, the
two halves that matter for spotting an input-bound pipeline.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Accumulates host-input vs device-step wall time per phase."""

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)
    _start: Optional[float] = None
    _phase: Optional[str] = None

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(self.totals[name] / max(self.counts[name], 1) * 1e3, 3),
            }
            for name in sorted(self.totals)
        }

    def report(self) -> str:
        lines = ["phase             total(s)   count   mean(ms)"]
        for name, s in self.summary().items():
            lines.append(f"{name:16s} {s['total_s']:9.3f} {s['count']:7d} "
                         f"{s['mean_ms']:10.3f}")
        return "\n".join(lines)
