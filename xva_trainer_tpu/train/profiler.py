"""Profiling / tracing (SURVEY.md §5.1 — the reference only has ad-hoc
frames/s counters; this adds real tracing on top of the same counters).

- ``start_profiler_server(port)``: live jax.profiler endpoint for
  TensorBoard's profile plugin / xprof capture.
- ``trace(dir)``: context manager capturing a trace of the enclosed steps.
- ``StepTimer``: per-step wall/device timing + frames/s aggregation matching
  the reference metric (Σ mel_lengths / optimizer-step time).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


def start_profiler_server(port: int = 9999) -> bool:
    import jax

    try:
        jax.profiler.start_server(port)
        return True
    except Exception:
        return False


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# ---- stateful start/stop pair (the /profileStart + /profileStop server
# endpoints, or any other async owner that can't hold a context manager) ----
_active_trace_dir: Optional[str] = None


def trace_start(log_dir: str) -> Dict:
    """Begin a jax.profiler trace; {'ok': bool, 'dir'/'error': ...}."""
    global _active_trace_dir
    import os

    import jax

    if _active_trace_dir is not None:
        return {"ok": False, "error": "trace already running",
                "dir": _active_trace_dir}
    os.makedirs(log_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(log_dir)
    except Exception as e:  # backend not initialized yet, etc.
        return {"ok": False, "error": str(e)}
    _active_trace_dir = log_dir
    return {"ok": True, "dir": log_dir}


def trace_stop() -> Dict:
    """End the active trace. The active-dir marker clears even when
    stop_trace raises — the trace is dead either way, and a sticky marker
    would wedge profiling until process restart."""
    global _active_trace_dir
    import jax

    if _active_trace_dir is None:
        return {"ok": False, "error": "no trace running"}
    d, _active_trace_dir = _active_trace_dir, None
    try:
        jax.profiler.stop_trace()
    except Exception as e:
        return {"ok": False, "error": str(e), "dir": d}
    return {"ok": True, "dir": d}


class StepTimer:
    def __init__(self):
        self.records: List[Dict] = []
        self._t0: Optional[float] = None
        self._frames = 0

    def start(self, frames: int = 0):
        self._t0 = time.perf_counter()
        self._frames = frames

    def stop(self, **extra) -> Dict:
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        rec = {
            "step_time_s": dt,
            "frames": self._frames,
            "frames_per_s": self._frames / dt if dt > 0 else 0.0,
            **extra,
        }
        self.records.append(rec)
        return rec

    def summary(self) -> Dict:
        if not self.records:
            return {}
        import numpy as np

        times = np.array([r["step_time_s"] for r in self.records])
        fps = np.array([r["frames_per_s"] for r in self.records])
        return {
            "steps": len(self.records),
            "mean_step_s": float(times.mean()),
            "p50_step_s": float(np.percentile(times, 50)),
            "p95_step_s": float(np.percentile(times, 95)),
            "mean_frames_per_s": float(fps.mean()),
        }
