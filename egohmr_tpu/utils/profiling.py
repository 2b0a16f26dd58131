"""Profiling / tracing utilities.

The reference has no profiling at all (SURVEY.md §5); here `trace()` captures
a jax.profiler trace viewable in TensorBoard/Perfetto, and `timed` gives
cheap wall-clock phase timing with device sync.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a device trace under `logdir` (no-op when logdir is None)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates per-phase wall time with block_until_ready syncs."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            name: self.totals[name] / max(self.counts[name], 1)
            for name in self.totals
        }
