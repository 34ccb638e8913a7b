"""Profiling: keyed wall-clock timers, phase bookmarks, device tracing.

TPU-native equivalents of the reference's three profiling mechanisms
(SURVEY §5):

- :class:`PerfTimer`       <- `FPerfTimer` (`RayUtils/Public/FPerfTimer.h:3-15`):
  static keyed wall-clock timer map (lock-guarded).
- :class:`PhaseTracer`     <- Unreal Insights `TRACE_BOOKMARK` phases in
  `APerformanceTest1` (`PerformanceTest1.cpp:51-208`): named phases with
  per-phase frame stats.
- :func:`device_trace`     <- `SCOPED_GPU_STAT` / draw events
  (`LightingShaders.cpp:24-30`): wraps `jax.profiler` traces with named
  annotations viewable in XProf/Perfetto/TensorBoard.
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from typing import Dict, List, Optional

import jax


class PerfTimer:
    """Keyed wall-clock timers (`FPerfTimer::StartTimer/StopTimer`)."""

    _lock = threading.Lock()
    _starts: Dict[str, float] = {}

    @classmethod
    def start(cls, key: str) -> None:
        with cls._lock:
            cls._starts[key] = time.perf_counter()

    @classmethod
    def stop(cls, key: str) -> float:
        """Seconds since `start(key)`; 0.0 for unknown keys."""
        now = time.perf_counter()
        with cls._lock:
            t0 = cls._starts.pop(key, None)
        return 0.0 if t0 is None else now - t0

    @classmethod
    def clear(cls) -> None:
        with cls._lock:
            cls._starts.clear()


class PhaseTracer:
    """Named benchmark phases with frame statistics (the bookmark model)."""

    def __init__(self):
        self.phases: List[dict] = []
        self._current: Optional[dict] = None

    @contextlib.contextmanager
    def phase(self, name: str):
        rec = {"name": name, "frames": 0, "start": time.perf_counter()}
        self._current = rec
        try:
            yield self
        finally:
            rec["seconds"] = time.perf_counter() - rec["start"]
            del rec["start"]
            if rec["frames"]:
                rec["ms_per_frame"] = 1000.0 * rec["seconds"] / rec["frames"]
            self.phases.append(rec)
            self._current = None

    def frame(self, n: int = 1) -> None:
        """Count a frame toward the active phase (no-op outside phases,
        e.g. warm-up/compile frames)."""
        if self._current is not None:
            self._current["frames"] += n

    def report(self) -> str:
        return json.dumps(self.phases, indent=2)

    def summary(self) -> dict:
        return {
            p["name"]: round(p.get("ms_per_frame", p["seconds"] * 1000.0), 3)
            for p in self.phases
        }


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None, name: str = "tbraymarcher"):
    """Capture an XLA device trace (XProf) around a block.

    ``None`` log_dir annotates only (named scopes still show in any outer
    trace); a path starts/stops a full `jax.profiler` trace there.
    """
    if log_dir is not None:
        jax.profiler.start_trace(log_dir)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        if log_dir is not None:
            jax.profiler.stop_trace()


named_scope = jax.named_scope  # per-kernel annotation, shows up in HLO/XProf
