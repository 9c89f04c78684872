"""Differential-drive odometry motion model.

Reference behavior: slam/Odometry.java:60-96.  Noise: one Gaussian sample for
the traveled distance (mean dCenter, sd (0.01+0.05|dCenter|)/2) and one for the
heading change (mean dTheta, sd 5deg+0.1|dTheta|); the heading noise is applied
BEFORE the translation so it steers the traveled direction
(slam/Odometry.java:91-94).

The reference's `probabiliyOf` motion prior (slam/Odometry.java:99-103)
contains a misplaced sqrt and evaluates a continuous density via
commons-math3's point `probability` (which is 0); we implement the intended
spec instead: a Gaussian log-density of the pose deviation from the sampled
pose under the odometry noise scales (divergence documented in SURVEY.md §7).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..types import Odom
from .geometry import wrap_angle


def noise_scales(odom: Odom, cfg):
    """(sd_center, sd_theta) per slam/Odometry.java:60-69."""
    sd_c = (cfg.base_center + jnp.abs(odom.d_center) * cfg.rel_center) / 2.0
    sd_t = math.radians(cfg.base_theta_deg) + jnp.abs(odom.d_theta) * cfg.rel_theta
    return sd_c, sd_t


def sample_motion(key, pose, odom: Odom, cfg):
    """Sample a new pose from the motion model (slam/Odometry.java:77-96).

    pose: (..., 3).  Returns pose'(..., 3).  Keys must be pre-split per
    particle (vmap axis) — the sampling itself is batched over leading dims.
    """
    sd_c, sd_t = noise_scales(odom, cfg)
    kc, kt = jax.random.split(key)
    d = odom.d_center + sd_c * jax.random.normal(kc, pose.shape[:-1], pose.dtype)
    th = odom.d_theta + sd_t * jax.random.normal(kt, pose.shape[:-1], pose.dtype)
    theta = wrap_angle(pose[..., 2] + th)
    x = pose[..., 0] + jnp.cos(theta) * d
    y = pose[..., 1] + jnp.sin(theta) * d
    return jnp.stack([x, y, theta], -1)


def apply_odometry(pose, odom: Odom):
    """Deterministic odometry propagation x0 (+) u (slam/Odometry.java:77-96
    with zero noise): rotate, then translate along the new heading."""
    theta = wrap_angle(pose[..., 2] + odom.d_theta)
    x = pose[..., 0] + jnp.cos(theta) * odom.d_center
    y = pose[..., 1] + jnp.sin(theta) * odom.d_center
    return jnp.stack([x, y, theta], -1)


def motion_log_prior(candidate, sampled, odom: Odom, cfg):
    """Log prior of a candidate pose given the motion-sampled pose.

    Penalizes the candidate's deviation from the sampled pose with the same
    noise scales the sampler used (the role the reference's BOBYQA objective
    intended for `u.probabiliyOf`, slam/GridMap.java:356)."""
    sd_c, sd_t = noise_scales(odom, cfg)
    dx = candidate[..., 0] - sampled[..., 0]
    dy = candidate[..., 1] - sampled[..., 1]
    dt = wrap_angle(candidate[..., 2] - sampled[..., 2])
    return (-(dx * dx + dy * dy) / (2.0 * sd_c * sd_c)
            - (dt * dt) / (2.0 * sd_t * sd_t))
