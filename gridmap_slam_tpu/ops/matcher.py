"""Correlative scan matcher.

Reference behavior: slam/GridMap.java:319-369.  The reference refines each
particle's pose with a BOBYQA derivative-free optimizer (<=500 sequential
objective evaluations of p(z|x,m) * p(x|x0,u)); its older brute-force variant
searched a +/-0.20 m, +/-15 deg window.

TPU design: a two-stage dense correlative search (coarse grid over the full
window, fine grid around the coarse argmax).  All candidate poses for all
beams are scored in one batched gather from the likelihood field plus a
log-sum reduction — no data-dependent control flow, embarrassingly parallel
across particles under vmap, and strictly stronger than a local optimizer
against the multi-modal likelihood fields this workload produces.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..types import Odom, Scan
from .geometry import scan_points
from .grid import beam_log_likelihood
from .motion import noise_scales


def _stage_scores(field, unknown, px, py, use, pose0, dxs, dys, dts, *,
                  resolution, origin, z_hit, max_range):
    """Score all (dt, dy, dx) pose offsets around pose0.

    field/unknown: (H, W); px/py/use: (B,) beam endpoints in robot frame and
    the hit&valid mask.  Returns meas: (nt, ny, nx) measurement log-likelihood
    (log p(z|x,m), slam/GridMap.java:261-294 in log space).
    """
    h, w = field.shape
    theta = pose0[2] + dts                       # (nt,)
    c, s = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
    rx = px[None, :] * c - py[None, :] * s       # (nt, B)
    ry = px[None, :] * s + py[None, :] * c

    wx = rx[:, None, :] + (pose0[0] + dxs)[None, :, None]   # (nt, nx, B)
    wy = ry[:, None, :] + (pose0[1] + dys)[None, :, None]   # (nt, ny, B)
    gx = jnp.floor((wx - origin[0]) / resolution).astype(jnp.int32)
    gy = jnp.floor((wy - origin[1]) / resolution).astype(jnp.int32)

    in_x = (gx >= 0) & (gx < w)                  # (nt, nx, B)
    in_y = (gy >= 0) & (gy < h)                  # (nt, ny, B)
    gx = jnp.clip(gx, 0, w - 1)
    gy = jnp.clip(gy, 0, h - 1)

    # (nt, ny, nx, B) flattened cell index.
    idx = gy[:, :, None, :] * w + gx[:, None, :, :]
    vals = field.reshape(-1)[idx]
    unk = unknown.reshape(-1)[idx]
    ll = beam_log_likelihood(vals, unk, z_hit, max_range)
    # Beams landing outside the map score the uniform likelihood, the same as
    # unexplored cells.  (The reference *skips* out-of-map beams,
    # slam/GridMap.java:276 — an implicit likelihood of 1, which would make a
    # global argmax push beams off the map; with a local optimizer the
    # reference never sees that gradient.  Documented divergence.)
    in_map = in_y[:, :, None, :] & in_x[:, None, :, :]
    uniform_ll = math.log(1.0 / max_range)
    ll = jnp.where(in_map, ll, uniform_ll)
    return jnp.sum(jnp.where(use[None, None, None, :], ll, 0.0), axis=-1)


def _prior_grid(dxs, dys, dts, sd_c, sd_t, weight=1.0):
    """Motion log-prior over the offset grid (deviation from the sampled
    pose; see ops/motion.motion_log_prior)."""
    d2 = dys[:, None] ** 2 + dxs[None, :] ** 2            # (ny, nx)
    pt = -(dts ** 2) / (2.0 * sd_t * sd_t)                # (nt,)
    return weight * (pt[:, None, None] - d2[None] / (2.0 * sd_c * sd_c))


def _argmax3(scores, dxs, dys, dts):
    flat = jnp.argmax(scores.reshape(-1))
    nt, ny, nx = scores.shape
    it = flat // (ny * nx)
    iy = (flat % (ny * nx)) // nx
    ix = flat % nx
    return dxs[ix], dys[iy], dts[it], flat


def correlative_match(field, unknown, scan: Scan, pose0, odom: Odom, *,
                      matcher_cfg, motion_cfg, resolution, origin, max_range):
    """Find the pose maximizing log p(z|x,m) + log p(x|x0,u) near pose0.

    Returns (best_pose (3,), meas_logscore scalar) where meas_logscore is the
    measurement-only log-likelihood at the best pose — the reference uses
    p(z|x,m) alone as the particle weight (slam/SLAM.java:99).
    """
    mc = matcher_cfg
    px, py = scan_points(scan)
    use = scan.valid & scan.hit
    sd_c, sd_t = noise_scales(odom, motion_cfg)

    wt = math.radians(mc.window_theta_deg)
    c_dxs = jnp.asarray(np.linspace(-mc.window_xy, mc.window_xy, mc.coarse_nxy),
                        jnp.float32)
    c_dts = jnp.asarray(np.linspace(-wt, wt, mc.coarse_nt), jnp.float32)

    kw = dict(resolution=resolution, origin=origin, z_hit=mc.z_hit,
              max_range=max_range)

    meas = _stage_scores(field, unknown, px, py, use, pose0,
                         c_dxs, c_dxs, c_dts, **kw)
    total = meas + _prior_grid(c_dxs, c_dxs, c_dts, sd_c, sd_t)
    bx, by, bt, _ = _argmax3(total, c_dxs, c_dxs, c_dts)

    # Fine stage: span one coarse step on each side of the coarse argmax.
    step_xy = 2.0 * mc.window_xy / max(mc.coarse_nxy - 1, 1)
    step_t = 2.0 * wt / max(mc.coarse_nt - 1, 1)
    f_off_xy = jnp.asarray(np.linspace(-step_xy, step_xy, mc.fine_nxy), jnp.float32)
    f_off_t = jnp.asarray(np.linspace(-step_t, step_t, mc.fine_nt), jnp.float32)
    f_dxs = bx + f_off_xy
    f_dys = by + f_off_xy
    f_dts = bt + f_off_t

    meas_f = _stage_scores(field, unknown, px, py, use, pose0,
                           f_dxs, f_dys, f_dts, **kw)
    total_f = meas_f + _prior_grid(f_dxs, f_dys, f_dts, sd_c, sd_t)
    fx, fy, ft, flat = _argmax3(total_f, f_dxs, f_dys, f_dts)
    meas_best = meas_f.reshape(-1)[flat]

    for _ in range(mc.extra_refine_stages):
        step_xy = 2.0 * step_xy / max(mc.fine_nxy - 1, 1)
        step_t = 2.0 * step_t / max(mc.fine_nt - 1, 1)
        r_dxs = fx + jnp.asarray(np.linspace(-step_xy, step_xy, mc.fine_nxy),
                                 jnp.float32)
        r_dys = fy + jnp.asarray(np.linspace(-step_xy, step_xy, mc.fine_nxy),
                                 jnp.float32)
        r_dts = ft + jnp.asarray(np.linspace(-step_t, step_t, mc.fine_nt),
                                 jnp.float32)
        meas_r = _stage_scores(field, unknown, px, py, use, pose0,
                               r_dxs, r_dys, r_dts, **kw)
        total_r = meas_r + _prior_grid(r_dxs, r_dys, r_dts, sd_c, sd_t)
        fx, fy, ft, flat = _argmax3(total_r, r_dxs, r_dys, r_dts)
        meas_best = meas_r.reshape(-1)[flat]

    best_pose = jnp.stack([pose0[0] + fx, pose0[1] + fy, pose0[2] + ft])
    return best_pose, meas_best
