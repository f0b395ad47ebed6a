"""Tracing / profiling helpers (jax.profiler + phase timers).

The reference only has ad-hoc cuda memory prints and time.time() deltas
(SURVEY.md §5.1, inference_partition.py:187-188,495-509); this subsystem
upgrades that: TensorBoard-compatible device traces, named phase timers,
and device memory statistics.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path

import jax


class PhaseTimer:
    """Accumulating named wall-clock timers with JSON export."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block:
                # make async-dispatched device work visible to the timer
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / self.counts[name], 2),
            }
            for name in self.totals
        }

    def dump(self, path: str):
        Path(path).write_text(json.dumps(self.summary(), indent=2))


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a TensorBoard-compatible device trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def memory_stats() -> dict:
    """Per-device memory statistics (bytes), where the backend reports them."""
    out = {}
    for d in jax.local_devices():
        try:
            out[str(d)] = d.memory_stats() or {}
        except Exception:
            out[str(d)] = {}
    return out
