"""Motion model tests (slam/Odometry.java:60-96 semantics)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gridmap_slam_tpu.config import MotionConfig
from gridmap_slam_tpu.ops.motion import motion_log_prior, noise_scales, sample_motion
from gridmap_slam_tpu.types import Odom


def _odom(dc, dt):
    return Odom(d_center=jnp.float32(dc), d_theta=jnp.float32(dt))


def test_noise_scales_formula():
    cfg = MotionConfig()
    sd_c, sd_t = jax.jit(lambda o: noise_scales(o, cfg))(_odom(0.3, -0.2))
    assert abs(float(sd_c) - (0.01 + 0.3 * 0.05) / 2) < 1e-6
    assert abs(float(sd_t) - (math.radians(5.0) + 0.1 * 0.2)) < 1e-6


def test_sample_motion_moments():
    cfg = MotionConfig()
    odom = _odom(0.5, 0.1)
    n = 4000
    keys = jax.random.split(jax.random.key(0), n)
    pose = jnp.zeros((3,))
    f = jax.jit(jax.vmap(lambda k: sample_motion(k, pose, odom, cfg)))
    out = np.asarray(f(keys))
    # heading noise applied first, so theta ~ N(0.1, sd_t)
    sd_t = math.radians(5.0) + 0.1 * 0.1
    assert abs(out[:, 2].mean() - 0.1) < 4 * sd_t / math.sqrt(n)
    assert abs(out[:, 2].std() - sd_t) < 0.15 * sd_t
    # traveled distance ~ N(0.5, sd_c), direction = new theta
    d = np.hypot(out[:, 0], out[:, 1])
    sd_c = (0.01 + 0.5 * 0.05) / 2
    assert abs(d.mean() - 0.5) < 4 * sd_c / math.sqrt(n)
    # x approx d*cos(theta)
    np.testing.assert_allclose(out[:, 0], d * np.cos(out[:, 2]), atol=1e-5)


def test_motion_log_prior_peak_at_sampled_pose():
    cfg = MotionConfig()
    odom = _odom(0.2, 0.0)
    sampled = jnp.asarray([1.0, 2.0, 0.3])
    f = jax.jit(lambda c: motion_log_prior(c, sampled, odom, cfg))
    at_peak = float(f(sampled))
    off = float(f(sampled + jnp.asarray([0.05, 0.0, 0.0])))
    assert at_peak == 0.0
    assert off < at_peak
