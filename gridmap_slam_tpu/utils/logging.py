"""Structured per-scan metrics logging (observability).

The reference's observability is stdout prints and ImGui readouts
(SURVEY.md §5): Neff, per-scan wall time, frame counts.  Here: a JSONL
metrics stream any monitoring stack can ingest, plus optional jax.profiler
trace capture around the hot steps.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

import numpy as np


class MetricsLogger:
    """Append-only JSONL metrics log; one record per scan."""

    def __init__(self, path, flush_every: int = 1):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a", buffering=1)
        self._flush_every = flush_every
        self._n = 0
        self._t0 = time.monotonic()

    def log_scan(self, step: int, info, scan_ms: Optional[float] = None,
                 **extra) -> None:
        """Record one scan's diagnostics from a StepInfo."""
        rec = {
            "t": round(time.monotonic() - self._t0, 4),
            "step": int(step),
            "neff": float(info.neff),
            "resampled": bool(info.resampled),
            "weighted_pose": np.asarray(info.weighted_pose).tolist(),
            "best_log_weight": float(info.best_log_weight),
        }
        if scan_ms is not None:
            rec["scan_ms"] = round(scan_ms, 3)
        rec.update(extra)
        self._fh.write(json.dumps(rec) + "\n")
        self._n += 1

    def log_event(self, kind: str, **fields) -> None:
        rec = {"t": round(time.monotonic() - self._t0, 4), "event": kind}
        rec.update(fields)
        self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._fh.close()


class Profiler:
    """Thin wrapper over jax.profiler trace capture for the SLAM hot path."""

    def __init__(self, log_dir: str = "/tmp/gridmap_slam_trace"):
        self.log_dir = log_dir
        self._active = False

    def __enter__(self):
        import jax
        jax.profiler.start_trace(self.log_dir)
        self._active = True
        return self

    def __exit__(self, *exc):
        import jax
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
