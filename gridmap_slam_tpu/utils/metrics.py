"""Trajectory and filter metrics.

The reference has no quantitative evaluation (SURVEY.md §6); this module
provides the ATE harness BASELINE.json requires plus the live diagnostics the
reference exposes informally (Neff readout, per-scan timing).
"""

from __future__ import annotations

import time

import numpy as np


def ate_rmse(estimate: np.ndarray, ground_truth: np.ndarray,
             align: bool = False) -> float:
    """Absolute trajectory error (RMSE over xy positions).

    estimate/ground_truth: (T, >=2) arrays of positions (extra columns such as
    theta are ignored).  With align=True, an SE(2) Umeyama alignment (rotation
    + translation, no scale) is applied first — use for gauge-free comparison
    of two SLAM runs; raw (align=False) matches "trajectory in the odometry
    start frame" comparisons against the reference.
    """
    e = np.asarray(estimate, np.float64)[:, :2]
    g = np.asarray(ground_truth, np.float64)[:, :2]
    if e.shape != g.shape:
        raise ValueError(f"shape mismatch {e.shape} vs {g.shape}")
    if align:
        e = align_se2(e, g)
    d = e - g
    return float(np.sqrt(np.mean(np.sum(d * d, axis=1))))


def align_se2(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares rigid 2-D alignment of src onto dst (Umeyama, no scale)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    cov = (dst - mu_d).T @ (src - mu_s) / len(src)
    u, _, vt = np.linalg.svd(cov)
    s = np.eye(2)
    if np.linalg.det(u @ vt) < 0:
        s[1, 1] = -1.0
    r = u @ s @ vt
    return (src - mu_s) @ r.T + mu_d


def relative_pose_error(estimate: np.ndarray, ground_truth: np.ndarray
                        ) -> float:
    """RMSE of per-step relative translation error (drift metric)."""
    de = np.diff(np.asarray(estimate, np.float64)[:, :2], axis=0)
    dg = np.diff(np.asarray(ground_truth, np.float64)[:, :2], axis=0)
    d = np.linalg.norm(de, axis=1) - np.linalg.norm(dg, axis=1)
    return float(np.sqrt(np.mean(d * d)))


class ScanTimer:
    """Wall-clock per-scan timing, the structured version of the reference's
    'SLAM Update took Xms' print (app/GridMapApp.java:177-182)."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean_ms(self) -> float:
        return 1e3 * float(np.mean(self.times)) if self.times else 0.0

    def scans_per_sec(self) -> float:
        return 1.0 / float(np.mean(self.times)) if self.times else 0.0
