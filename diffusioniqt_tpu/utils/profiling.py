"""Tracing / profiling as a first-class module (SURVEY.md §5).

The reference only wall-clocks its sampling loop (test.py:172,245-246); here:
  * ``phase_timer`` — named wall-clock phases with a device sync
  * ``trace`` — jax.profiler trace context writing TensorBoard-compatible
    traces (view with tensorboard_plugin_profile)
  * ``annotate`` — TraceAnnotation for marking regions inside steps
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase, syncing the device."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            elapsed = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + elapsed
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {total / n * 1e3:.2f}ms avg x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/diffusioniqt_trace"):
    """jax.profiler trace context."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
