"""Timing + profiling utilities.

The reference's only instrumentation is a wall-clock print per render
(``src/rayTracer.cpp:39,72-73``).  Here: a phase timer with rays/sec
reporting, and an opt-in ``jax.profiler`` trace context for TPU runs
(SURVEY.md §5 tracing gap).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase; blocks on device work."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {total / n * 1e3:.1f} ms/call x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """``jax.profiler`` trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def rays_per_second(
    xres: int, yres: int, spp: int, depth: int, seconds: float
) -> float:
    """Wavefront ray-query throughput: closest + shadow queries issued."""
    return xres * yres * spp * depth * 2 / max(seconds, 1e-12)
