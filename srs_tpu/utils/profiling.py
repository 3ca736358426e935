"""Tracing / profiling hooks.

The reference's only observability is wall-clock stopwatches scattered
through the stages (SURVEY §5: main.py:287,412, sr:600, blending examples).
This module centralizes that: stage timers that accumulate into a report,
plus `jax.profiler` trace capture around any region for real device
timelines (view with TensorBoard or xprof).
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, List, Optional

__all__ = ["StageTimer", "trace_region", "device_trace"]


@dataclass
class StageTimer:
    """Accumulating named stage timer (thread-safe enough for the host
    pipeline's sequential stages)."""

    times: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)
    _order: List[str] = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self.times:
                self._order.append(name)
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Any]:
        total = sum(self.times.values())
        return {
            "total_s": round(total, 4),
            "stages": [
                {
                    "name": n,
                    "seconds": round(self.times[n], 4),
                    "calls": self.counts[n],
                    "share": round(self.times[n] / total, 3) if total else 0.0,
                }
                for n in self._order
            ],
        }

    def __str__(self) -> str:
        return json.dumps(self.report(), indent=2)


@contextlib.contextmanager
def trace_region(name: str) -> Iterator[None]:
    """Annotate a region in the device profile (no-op without a trace)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
