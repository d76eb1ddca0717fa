"""Profiling & observability: stage timers, RTF accounting, XLA traces.

The reference's only instrumentation is a chrono stopwatch used for init/RTF
prints (cpp/src/utils/timer.hpp:15-80, python/whisper_cli.py:57-66). Here
profiling is first-class: hierarchical stage timers with RTF/throughput
derivation, and one-call jax.profiler trace capture for TensorBoard.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, Iterator, Optional


@dataclass
class StageStats:
    calls: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def add(self, dt: float):
        self.calls += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)


class StageTimer:
    """Named stage timing with audio-seconds accounting for RTF."""

    def __init__(self):
        self.stages: Dict[str, StageStats] = defaultdict(StageStats)
        self.audio_seconds: float = 0.0

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name].add(time.perf_counter() - t0)

    def add_audio(self, seconds: float):
        self.audio_seconds += seconds

    def report(self) -> dict:
        total = sum(s.total_s for s in self.stages.values())
        out = {
            "total_s": total,
            "audio_seconds": self.audio_seconds,
            "rtf": total / self.audio_seconds if self.audio_seconds else None,
            "audio_seconds_per_second": self.audio_seconds / total if total else None,
            "stages": {
                k: {
                    "calls": v.calls,
                    "total_s": round(v.total_s, 4),
                    "mean_ms": round(1e3 * v.total_s / max(v.calls, 1), 3),
                    "min_ms": round(1e3 * v.min_s, 3) if v.calls else None,
                    "max_ms": round(1e3 * v.max_s, 3),
                    "share": round(v.total_s / total, 4) if total else None,
                }
                for k, v in sorted(self.stages.items(),
                                   key=lambda kv: -kv[1].total_s)
            },
        }
        return out

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.report(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


@contextlib.contextmanager
def xla_trace(logdir: str = "/tmp/whisper_tpu_trace") -> Iterator[str]:
    """Capture an XLA/TPU profile viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
