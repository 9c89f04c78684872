"""Angle/transform/de-skew unit tests against the NumPy oracle."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridmap_slam_tpu.ops import geometry as G
from gridmap_slam_tpu.oracle import numpy_ref as O
from gridmap_slam_tpu.types import Odom, Scan


def test_wrap_angle():
    f = jax.jit(G.wrap_angle)
    for a in [-7.0, -3.2, -1.0, 0.0, 1.0, 3.2, 9.9]:
        want = math.atan2(math.sin(a), math.cos(a))
        assert abs(float(f(a)) - want) < 1e-6


def test_se2_roundtrip():
    f = jax.jit(lambda a, b: G.se2_compose(a, G.se2_relative(a, b)))
    a = jnp.asarray([0.3, -1.2, 0.7])
    b = jnp.asarray([-2.0, 0.5, -2.9])
    out = np.asarray(f(a, b))
    np.testing.assert_allclose(out, np.asarray(b), atol=1e-5)


def test_robot_to_world_matches_reference_transform():
    # math/Transform.java:13-32: world = R(theta) @ local + t
    pose = jnp.asarray([1.0, 2.0, 0.6])
    f = jax.jit(G.robot_to_world)
    wx, wy = f(pose, jnp.asarray(0.5), jnp.asarray(-0.25))
    c, s = math.cos(0.6), math.sin(0.6)
    assert abs(float(wx) - (0.5 * c + 0.25 * s + 1.0)) < 1e-6
    assert abs(float(wy) - (0.5 * s - 0.25 * c + 2.0)) < 1e-6


def test_deskew_matches_oracle():
    rng = np.random.RandomState(0)
    n = 50
    angles = np.sort(rng.uniform(-np.pi, np.pi, n))
    dists = rng.uniform(0.5, 8.0, n)
    hits = rng.uniform(size=n) > 0.3
    d_center, d_theta = 0.23, -0.31

    oa, od, oh = O.deskew(angles, dists, hits, d_center, d_theta)

    scan = Scan.from_arrays(angles, dists, hits, max_beams=64)
    odom = Odom(d_center=jnp.float32(d_center), d_theta=jnp.float32(d_theta))
    out = jax.jit(G.deskew_scan)(scan, odom)
    np.testing.assert_allclose(np.asarray(out.angle)[:n], oa, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.dist)[:n], od, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.hit)[:n], oh)
