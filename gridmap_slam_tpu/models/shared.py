"""Shared-map particle filter — the scalable mode for huge particle counts.

The reference gives EVERY particle its own occupancy grid (slam/SLAM.java:30-47),
which caps particle count by memory (500 x two 14,400-double arrays already
dominates its allocations; 1M such particles would need ~115 TB).  BASELINE
config 3 ("1M particles, tiled 200x200 m grid") is only feasible with the
map factored out of the per-particle state — the SURVEY §7 "hard parts"
design decision.

This model keeps ONE log-odds map; particles carry only (pose, log-weight).
Per scan: the LL field is built once, every particle scan-matches against it
(vmapped correlative search), weights/resampling run on poses alone (gather
of 3 floats per particle instead of two full maps), and the scan is
integrated once at the strongest particle's refined pose.  The per-particle
cost is pure matcher compute, so millions of particles vmap/shard cleanly;
the map cost is independent of P.

Trade-off vs the reference semantics (documented): map hypotheses are not
per-particle, so mapping errors are not marginalized over trajectories —
this is scan-to-map localization with a particle belief, appropriate when
P is huge and the map is large.  The per-particle-map `RBPF` remains the
reference-parity default.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import SlamConfig
from ..ops.geometry import deskew_scan
from ..ops.grid import gaussian_kernel, likelihood_field
from ..ops.matcher import (correlative_match, log_likelihood_field,
                           score_pose)
from ..ops.motion import apply_odometry, sample_motion
from ..ops.raycast import build_beam_lut, integrate_scan
from ..ops.resample import neff, systematic_indices, weighted_mean_pose
from ..types import Frame, StepInfo


@struct.dataclass
class SharedMapState:
    """poses: (P, 3); log_weights: (P,); logodds: (H, W) single shared map."""

    poses: jax.Array
    log_weights: jax.Array
    logodds: jax.Array
    key: jax.Array
    step: jax.Array


class SharedMapSLAM:
    """Shared-map particle filter for a fixed SlamConfig."""

    def __init__(self, config: SlamConfig):
        self.config = config
        m = config.map
        self.kernel = gaussian_kernel(m.likelihood_sigma, m.likelihood_radius)
        self._pallas = False  # map ops run once per scan; XLA path is fine

    def init(self, key, pose=(0.0, 0.0, 0.0)) -> SharedMapState:
        cfg = self.config
        p = cfg.num_particles
        dtype = jnp.dtype(cfg.dtype)
        return SharedMapState(
            poses=jnp.broadcast_to(jnp.asarray(pose, dtype), (p, 3)).copy(),
            log_weights=jnp.full((p,), -math.log(p), dtype),
            logodds=jnp.zeros((cfg.map.cells_y, cfg.map.cells_x), dtype),
            key=key,
            step=jnp.asarray(0, jnp.int32),
        )

    def step(self, state: SharedMapState, frame: Frame
             ) -> Tuple[SharedMapState, StepInfo]:
        cfg = self.config
        origin = (float(cfg.map.origin[0]), float(cfg.map.origin[1]))
        res = float(cfg.map.resolution)

        scan = deskew_scan(frame.scan, frame.odom)
        lut = build_beam_lut(scan, cfg.beam_lut_bins)
        odom = frame.odom
        keep = (jnp.abs(odom.d_theta)
                <= math.radians(cfg.skip_update_dtheta_deg)
                ).astype(state.logodds.dtype)

        # LL field built ONCE for the shared map.
        field, unknown = likelihood_field(state.logodds, self.kernel)
        llf = log_likelihood_field(field, unknown, cfg.matcher.z_hit,
                                   cfg.sensor.max_range)

        def particle(pose, key):
            pose_s = sample_motion(key, pose, odom, cfg.motion)
            if cfg.matcher.enabled:
                return correlative_match(
                    llf, scan, pose_s, odom,
                    matcher_cfg=cfg.matcher, motion_cfg=cfg.motion,
                    resolution=res, origin=origin,
                    max_range=cfg.sensor.max_range,
                    prior_center=apply_odometry(pose, odom))
            return pose_s, score_pose(
                llf, scan, pose_s, z_hit=cfg.matcher.z_hit, resolution=res,
                origin=origin, max_range=cfg.sensor.max_range)

        key, k_motion, k_resample = jax.random.split(state.key, 3)
        keys = jax.random.split(k_motion, cfg.num_particles)

        vm = jax.vmap(particle)
        chunk = cfg.particle_chunk
        if chunk and cfg.num_particles > chunk:
            assert cfg.num_particles % chunk == 0
            n_chunks = cfg.num_particles // chunk
            poses, scores = jax.lax.map(
                lambda a: vm(*a),
                (state.poses.reshape(n_chunks, chunk, 3),
                 keys.reshape((n_chunks, chunk) + keys.shape[1:])))
            poses = poses.reshape(cfg.num_particles, 3)
            scores = scores.reshape(cfg.num_particles)
        else:
            poses, scores = vm(state.poses, keys)

        # Per-scan importance weights: the reference overwrites weights with
        # p(z|x,m) each update (slam/SLAM.java:99); with accumulate_weights
        # the filter multiplies them in (sequential importance sampling).
        log_weights = scores.astype(state.log_weights.dtype)
        if cfg.accumulate_weights:
            log_weights = log_weights + state.log_weights
        n_eff = neff(log_weights)
        best_index = jnp.argmax(log_weights)
        best_pose = poses[best_index]
        weighted = weighted_mean_pose(poses, log_weights)

        # Integrate once at the strongest particle's pose.
        delta = integrate_scan(
            state.logodds, best_pose, scan, lut, resolution=res,
            origin=origin, l_free=cfg.sensor.l_free, l_occ=cfg.sensor.l_occ,
            tol_cells=cfg.sensor.hit_tolerance_cells)
        logodds = state.logodds + keep * delta

        do_resample = n_eff < (cfg.num_particles * cfg.resample_fraction)

        def resample(args):
            poses, log_weights = args
            idx = systematic_indices(k_resample, log_weights)
            new_lw = (jnp.zeros_like(log_weights)
                      if cfg.accumulate_weights
                      else jnp.take(log_weights, idx, axis=0))
            return jnp.take(poses, idx, axis=0), new_lw

        poses, log_weights = jax.lax.cond(
            do_resample, resample, lambda a: a, (poses, log_weights))

        new_state = SharedMapState(poses=poses, log_weights=log_weights,
                                   logodds=logodds, key=key,
                                   step=state.step + 1)
        info = StepInfo(neff=n_eff, weighted_pose=weighted,
                        best_pose=best_pose, best_index=best_index,
                        best_log_weight=log_weights.max(),
                        resampled=do_resample)
        return new_state, info

    def replay(self, state, frames):
        def body(s, f):
            return self.step(s, f)
        return jax.lax.scan(body, state, frames)

    def replay_jit(self):
        return jax.jit(self.replay, donate_argnums=(0,))

    def best_map(self, state: SharedMapState):
        """The (single, shared) log-odds map — interface parity with
        RBPF.best_map so app surfaces work with either engine."""
        return state.logodds

    # ---------------------------------------------------------- blocked step
    def _blocked_fns(self, block: int):
        """Jitted pieces of the block-dispatched step (built once)."""
        if getattr(self, "_blocked_cache", None) == block:
            return self._blocked_jits
        cfg = self.config
        origin = (float(cfg.map.origin[0]), float(cfg.map.origin[1]))
        res = float(cfg.map.resolution)

        @jax.jit
        def prepare(logodds, frame):
            scan = deskew_scan(frame.scan, frame.odom)
            field, unknown = likelihood_field(logodds, self.kernel)
            llf = log_likelihood_field(field, unknown, cfg.matcher.z_hit,
                                       cfg.sensor.max_range)
            return scan, llf

        @jax.jit
        def block_update(llf, scan, odom, poses_b, keys_b):
            def particle(pose, k):
                pose_s = sample_motion(k, pose, odom, cfg.motion)
                if cfg.matcher.enabled:
                    return correlative_match(
                        llf, scan, pose_s, odom, matcher_cfg=cfg.matcher,
                        motion_cfg=cfg.motion, resolution=res, origin=origin,
                        max_range=cfg.sensor.max_range,
                        prior_center=apply_odometry(pose, odom))
                return pose_s, score_pose(
                    llf, scan, pose_s, z_hit=cfg.matcher.z_hit,
                    resolution=res, origin=origin,
                    max_range=cfg.sensor.max_range)
            return jax.vmap(particle)(poses_b, keys_b)

        @jax.jit
        def finalize(logodds, poses, scores, prev_lw, odom, scan,
                     k_resample):
            lut = build_beam_lut(scan, cfg.beam_lut_bins)
            keep = (jnp.abs(odom.d_theta)
                    <= math.radians(cfg.skip_update_dtheta_deg)
                    ).astype(logodds.dtype)
            lw = scores + prev_lw if cfg.accumulate_weights else scores
            n_eff = neff(lw)
            best_index = jnp.argmax(lw)
            best_pose = poses[best_index]
            weighted = weighted_mean_pose(poses, lw)
            delta = integrate_scan(
                logodds, best_pose, scan, lut, resolution=res,
                origin=origin, l_free=cfg.sensor.l_free,
                l_occ=cfg.sensor.l_occ,
                tol_cells=cfg.sensor.hit_tolerance_cells)
            new_logodds = logodds + keep * delta
            do_resample = n_eff < (cfg.num_particles
                                   * cfg.resample_fraction)

            def resample(args):
                poses, lw = args
                idx = systematic_indices(k_resample, lw)
                new_lw = (jnp.zeros_like(lw) if cfg.accumulate_weights
                          else jnp.take(lw, idx, axis=0))
                return jnp.take(poses, idx, axis=0), new_lw

            poses, lw = jax.lax.cond(do_resample, resample,
                                     lambda a: a, (poses, lw))
            info = StepInfo(neff=n_eff, weighted_pose=weighted,
                            best_pose=best_pose, best_index=best_index,
                            best_log_weight=lw.max(), resampled=do_resample)
            return new_logodds, poses, lw, info

        self._blocked_cache = block
        self._blocked_jits = (prepare, block_update, finalize)
        return self._blocked_jits

    def step_blocked(self, state: SharedMapState, frame: Frame,
                     block: int) -> Tuple[SharedMapState, StepInfo]:
        """One SLAM update issued as multiple device dispatches of at most
        `block` particles each (LL-field build; per-block matcher; tiny
        finalize).  Functionally equivalent to `step` (same math, same
        resampler); exists because the tunneled dev chip faults when one
        dispatch gathers more than ~20 GB (docs/TPU_FAULT.md) — per-block
        matcher work stays under that budget at any total particle count.
        On production runtimes use `step`/`replay` (single dispatch)."""
        cfg = self.config
        p = cfg.num_particles
        assert p % block == 0, (p, block)
        prepare, block_update, finalize = self._blocked_fns(block)

        scan, llf = prepare(state.logodds, frame)
        key, k_motion, k_resample = jax.random.split(state.key, 3)
        keys = jax.random.split(k_motion, p)

        poses_out = []
        scores_out = []
        for b0 in range(0, p, block):
            pb, sb = block_update(llf, scan, frame.odom,
                                  state.poses[b0:b0 + block],
                                  keys[b0:b0 + block])
            poses_out.append(pb)
            scores_out.append(sb)
        poses = jnp.concatenate(poses_out, axis=0)
        scores = jnp.concatenate(scores_out, axis=0).astype(
            state.log_weights.dtype)

        logodds, poses, lw, info = finalize(
            state.logodds, poses, scores, state.log_weights, frame.odom,
            scan, k_resample)
        new_state = SharedMapState(poses=poses, log_weights=lw,
                                   logodds=logodds, key=key,
                                   step=state.step + 1)
        return new_state, info
