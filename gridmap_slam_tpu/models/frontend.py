"""Pose-graph SLAM frontend: keyframes, loop closure, global correction.

Capability extension over the reference (BASELINE config 4: "loop-closure
dataset, pose-graph BA over collectives"): an online frontend that

  1. promotes scans to keyframes on travel/turn thresholds,
  2. chains keyframes with odometry/scan-match edges,
  3. proposes spatially-near / temporally-far closure candidates
     (models/posegraph.propose_closures),
  4. verifies each candidate by correlatively matching the two keyframe
     scans (models/posegraph.verify_closure, batched under vmap),
  5. optimizes the graph by damped Gauss-Newton (models/posegraph.optimize),
  6. rebuilds the global occupancy grid from the optimized poses — log-odds
     updates are additive and the dense scan integration is a pure function
     of (pose, scan), so the rebuild is one vmapped delta + sum.

The heavy steps (verify, optimize, rebuild) are jitted with fixed-width
padding; candidate generation and thresholding stay host-side (they are
tiny and inherently data-dependent).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops.geometry import se2_relative, wrap_angle
from ..ops.grid import gaussian_kernel
from ..ops.raycast import build_beam_lut, integrate_scan
from ..types import Scan
from . import posegraph as PG


@dataclasses.dataclass
class FrontendConfig:
    keyframe_dist: float = 0.3         # m of travel between keyframes
    keyframe_angle_deg: float = 20.0   # or heading change
    closure_min_gap: int = 8           # keyframe index separation
    closure_max_dist: float = 1.2      # m candidate radius
    # Acceptance thresholds for bidirectional closure verification
    # (posegraph.verify_closure_bidirectional).  min_score is the worse of
    # the two directions' PER-BEAM mean measurement log-likelihood at the
    # matched pose: a true closure lands most beams on blurred walls
    # (per-beam ~ -1.0); a visually-wrong match leaks endpoints into known
    # free space (~ -4.6 each), dragging the mean below ~ -1.3.  The
    # forward/reverse composed-transform error catches perceptual aliasing
    # (symmetric rooms score well both ways but disagree on the pose).
    closure_min_score: float = -1.25
    closure_max_consistency: float = 0.25   # m
    max_candidates: int = 32
    # Closure verification search window: much wider than the per-scan
    # matcher (odometry drift across a loop can be large), and with NO
    # motion prior (there is no odometry constraint between loop ends —
    # a prior would pin the match to the drifted guess).
    closure_window_xy: float = 1.0
    closure_window_theta_deg: float = 30.0
    closure_coarse_nxy: int = 15
    closure_coarse_nt: int = 13
    closure_refine_stages: int = 3
    odom_w_xy: float = 200.0
    odom_w_t: float = 400.0
    closure_w_xy: float = 400.0
    closure_w_t: float = 800.0
    gn_iterations: int = 10


class PoseGraphSLAM:
    """Keyframe pose-graph layered over any pose source (SLAM filter or raw
    odometry).  Feed (pose, scan) per processed scan via `add`."""

    def __init__(self, slam_config: SlamConfig,
                 cfg: FrontendConfig = FrontendConfig()):
        self.scfg = slam_config
        self.cfg = cfg
        self.kernel = gaussian_kernel(slam_config.map.likelihood_sigma,
                                      slam_config.map.likelihood_radius)
        self.kf_poses: List[np.ndarray] = []
        self.kf_scans: List[Scan] = []
        self.closures: List[Tuple[int, int, np.ndarray, float]] = []
        self._verify_jit = None
        self._rebuild_jit = None

    # ----------------------------------------------------------- keyframes
    def add(self, pose, scan: Scan) -> bool:
        """Consider (pose, scan) for keyframe promotion; returns True if
        promoted."""
        pose = np.asarray(pose, np.float64)
        if self.kf_poses:
            last = self.kf_poses[-1]
            d = np.hypot(*(pose[:2] - last[:2]))
            dth = abs(float(wrap_angle(pose[2] - last[2])))
            if (d < self.cfg.keyframe_dist
                    and dth < math.radians(self.cfg.keyframe_angle_deg)):
                return False
        self.kf_poses.append(pose)
        self.kf_scans.append(scan)
        return True

    @property
    def num_keyframes(self) -> int:
        return len(self.kf_poses)

    # -------------------------------------------------------- loop closure
    def _verifier(self):
        if self._verify_jit is None:
            scfg = self.scfg
            # impl="gather": the closure search has FEW candidates over a
            # WIDE window (1 m -> an 81x81-shift splat would unroll ~6.5k
            # slices); the gather formulation is the right shape here.
            mc = dataclasses.replace(
                scfg.matcher,
                window_xy=self.cfg.closure_window_xy,
                window_theta_deg=self.cfg.closure_window_theta_deg,
                coarse_nxy=self.cfg.closure_coarse_nxy,
                coarse_nt=self.cfg.closure_coarse_nt,
                extra_refine_stages=self.cfg.closure_refine_stages,
                prior_weight=0.0, impl="gather")

            def verify(scan_i: Scan, scan_j: Scan, rel_guess):
                return PG.verify_closure_bidirectional(
                    scan_i, scan_j, rel_guess, map_cfg=scfg.map,
                    matcher_cfg=mc, motion_cfg=scfg.motion,
                    sensor_cfg=scfg.sensor, kernel=self.kernel,
                    beam_lut_bins=scfg.beam_lut_bins)

            self._verify_jit = jax.jit(jax.vmap(verify))
        return self._verify_jit

    def detect_closures(self) -> int:
        """Propose + verify closure candidates; returns how many were
        accepted and recorded (deduplicated by pair)."""
        props = PG.propose_closures(
            np.asarray(self.kf_poses), min_gap=self.cfg.closure_min_gap,
            max_dist=self.cfg.closure_max_dist,
            max_candidates=self.cfg.max_candidates)
        seen = {(i, j) for i, j, _, _ in self.closures}
        pairs = [(i, j) for i, j in props.pairs if (i, j) not in seen]
        if not pairs:
            return 0

        # Pad the candidate batch to a fixed width so the jitted verifier
        # compiles once (variable widths would recompile per call).
        width = self.cfg.max_candidates
        padded = pairs + [pairs[0]] * (width - len(pairs))
        scan_i = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[self.kf_scans[i] for i, _ in padded])
        scan_j = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[self.kf_scans[j] for _, j in padded])
        guesses = jnp.asarray([
            np.asarray(se2_relative(jnp.asarray(self.kf_poses[i]),
                                    jnp.asarray(self.kf_poses[j])))
            for i, j in padded], jnp.float32)
        rels, scores, consist = self._verifier()(scan_i, scan_j, guesses)
        rels = np.asarray(rels)
        scores = np.asarray(scores)
        consist = np.asarray(consist)
        n = 0
        for k, (i, j) in enumerate(pairs):
            if (scores[k] >= self.cfg.closure_min_score
                    and consist[k] <= self.cfg.closure_max_consistency):
                self.closures.append((i, j, rels[k].astype(np.float64),
                                      float(scores[k])))
                n += 1
        return n

    # --------------------------------------------------------- optimization
    def optimize(self, chain_breaks: Tuple[int, ...] = ()
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """Build the graph (odometry chain + accepted closures), run GN, and
        return (optimized_poses (K,3), chi2 history).

        chain_breaks: keyframe indices i whose odometry edge i -> i+1 must
        be DROPPED — the multi-robot case (BASELINE config 5): keyframes of
        several robots concatenated into one graph have no odometry
        constraint across the robot seams; alignment there comes from
        cross-robot loop closures instead."""
        poses = np.asarray(self.kf_poses, np.float32)
        ei, ej, ez, ew = PG.odometry_edges(poses, self.cfg.odom_w_xy,
                                           self.cfg.odom_w_t)
        if chain_breaks:
            keep = ~np.isin(np.asarray(ei), np.asarray(chain_breaks,
                                                       np.int32))
            ei, ej, ez, ew = ei[keep], ej[keep], ez[keep], ew[keep]
        if self.closures:
            ci = np.asarray([c[0] for c in self.closures], np.int32)
            cj = np.asarray([c[1] for c in self.closures], np.int32)
            cz = np.asarray([c[2] for c in self.closures], np.float32)
            cw = np.tile(np.asarray([self.cfg.closure_w_xy,
                                     self.cfg.closure_w_xy,
                                     self.cfg.closure_w_t], np.float32),
                         (len(self.closures), 1))
            ei = np.concatenate([ei, ci])
            ej = np.concatenate([ej, cj])
            ez = np.concatenate([ez, cz])
            ew = np.concatenate([ew, cw])
        graph = PG.PoseGraph(nodes=jnp.asarray(poses),
                             edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
                             edge_z=jnp.asarray(ez), edge_w=jnp.asarray(ew))
        graph, chi2 = jax.jit(
            lambda g: PG.optimize(g, iterations=self.cfg.gn_iterations))(graph)
        opt = np.asarray(graph.nodes, np.float64)
        self.kf_poses = [p for p in opt]
        return opt, np.asarray(chi2)

    # ----------------------------------------------------------- map rebuild
    def rebuild_map(self, poses: Optional[np.ndarray] = None) -> jnp.ndarray:
        """Re-integrate every keyframe scan at its (optimized) pose into a
        fresh grid: sum of vmapped pure deltas (log-odds adds commute)."""
        scfg = self.scfg
        if poses is None:
            poses = np.asarray(self.kf_poses)
        scans = jax.tree.map(lambda *xs: jnp.stack(xs), *self.kf_scans)
        origin = (float(scfg.map.origin[0]), float(scfg.map.origin[1]))

        @jax.jit
        def rebuild(scans, poses):
            h, w = scfg.map.cells_y, scfg.map.cells_x
            zero = jnp.zeros((h, w), jnp.float32)

            def one(scan, pose):
                lut = build_beam_lut(scan, scfg.beam_lut_bins)
                return integrate_scan(
                    zero, pose, scan, lut,
                    resolution=float(scfg.map.resolution), origin=origin,
                    l_free=scfg.sensor.l_free, l_occ=scfg.sensor.l_occ,
                    tol_cells=scfg.sensor.hit_tolerance_cells)

            # lax.scan over keyframes: the dense update's per-cell one-hot
            # workspace times n_keyframes OOMs HBM on long logs (measured:
            # 216-scan tour x 14 m map wants 16.2 G of 15.75 G); the scan
            # keeps ONE keyframe's workspace live and accumulates in place
            def step(acc, sp):
                scan, pose = sp
                return acc + one(scan, pose), None

            acc, _ = jax.lax.scan(step, zero, (scans, poses))
            return acc

        return rebuild(scans, jnp.asarray(poses, jnp.float32))
