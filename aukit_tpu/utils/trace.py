"""Tracing / profiling hooks (SURVEY.md §5.1 — the reference has none; the new
framework provides jax.profiler traces plus lightweight per-chunk timing).

Usage:
    with trace_session("/tmp/aukit-trace"):   # XLA/device trace (Perfetto)
        engine.step()

    meter = ChunkMeter()
    with meter.measure(samples=48000):
        ...
    print(meter.summary())

CLIs expose this via ``--trace DIR``.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time


@contextlib.contextmanager
def trace_session(log_dir: str):
    """jax.profiler trace (view with TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class ChunkMeter:
    """Per-chunk wall-time meter with realtime-factor reporting."""

    chunks: int = 0
    samples: int = 0
    seconds: float = 0.0
    worst: float = 0.0
    rate: int = 48000

    @contextlib.contextmanager
    def measure(self, samples: int):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.chunks += 1
        self.samples += samples
        self.seconds += dt
        self.worst = max(self.worst, dt)

    @property
    def realtime_factor(self) -> float:
        return self.samples / self.seconds / self.rate if self.seconds else 0.0

    def summary(self) -> dict:
        return {
            "chunks": self.chunks,
            "samples": self.samples,
            "wall_seconds": round(self.seconds, 6),
            "worst_chunk_seconds": round(self.worst, 6),
            "realtime_factor": round(self.realtime_factor, 1),
        }
