"""Tracing / profiling — the TPU equivalent of the reference's wall-clock
stage banners (test/analysis.cpp:127-136, Training.pl:1158-1172;
SURVEY.md §5): per-stage block_until_ready timers, an audio-seconds/s
throughput meter, and a jax.profiler trace context.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StageTimer:
    """Accumulates per-stage wall time; device work is synchronized so the
    numbers mean what the C++ per-stage printouts meant."""

    def __init__(self, log=print):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._log = log

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [f"{k}: {v * 1000:.1f} ms ({self.counts[k]}x)"
                 for k, v in sorted(self.totals.items(),
                                    key=lambda kv: -kv[1])]
        out = "\n".join(lines)
        self._log(out)
        return out


class ThroughputMeter:
    """audio-seconds/s/chip — the BASELINE north-star metric."""

    def __init__(self, n_chips: int = 1):
        self.n_chips = n_chips
        self.audio_seconds = 0.0
        self.wall = 0.0

    @contextlib.contextmanager
    def measure(self, audio_seconds: float, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.wall += time.perf_counter() - t0
        self.audio_seconds += audio_seconds

    @property
    def audio_s_per_s_per_chip(self) -> float:
        return self.audio_seconds / max(self.wall, 1e-12) / self.n_chips


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """jax.profiler trace (view with tensorboard / xprof)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
