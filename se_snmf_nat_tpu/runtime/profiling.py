"""Tracing / metrics (SURVEY §5 'Tracing / profiling').

The reference had tic/toc around the GPU solver and per-iteration objective
prints.  Here:

  * ``trace(dir)``       — context manager around jax.profiler.trace; open
                           the dump with TensorBoard/XProf to see per-op
                           device timelines.
  * ``StageTimer``       — named wall-clock stages with audio-second
                           accounting; renders the per-stage
                           audio-seconds/s table the BASELINE metric asks
                           for.
  * ``annotate(name)``   — jax.profiler.TraceAnnotation passthrough so
                           pipeline stages show up named in traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


@dataclass
class StageTimer:
    """Accumulates wall time per named stage plus processed audio seconds."""

    stages: dict = field(default_factory=dict)
    audio_seconds: float = 0.0

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) \
                + time.perf_counter() - t0

    def add_audio(self, seconds: float) -> None:
        self.audio_seconds += seconds

    @property
    def total(self) -> float:
        return sum(self.stages.values())

    def report(self) -> dict:
        out = {
            "audio_seconds": round(self.audio_seconds, 3),
            "wall_seconds": round(self.total, 4),
            "audio_seconds_per_s": round(
                self.audio_seconds / self.total, 2) if self.total else 0.0,
            "stages": {k: round(v, 4) for k, v in self.stages.items()},
        }
        return out

    def json(self) -> str:
        return json.dumps(self.report())
