"""Splat-correlation matcher equivalence (ops/matcher_splat.py): identical
scores/poses to the gather-based bilinear matcher, by construction — the
splat folds each candidate's fractional offset into the endpoint image so
every stage's score equals the corresponding bilinear-lookup sum."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gridmap_slam_tpu.config import MatcherConfig, SlamConfig
from gridmap_slam_tpu.ops.geometry import scan_points
from gridmap_slam_tpu.ops.grid import gaussian_kernel, likelihood_field
from gridmap_slam_tpu.ops.matcher import (_stage_scores,
                                          correlative_match,
                                          log_likelihood_field)
from gridmap_slam_tpu.ops.matcher_splat import (_pad_field, _splat,
                                                _window_scores,
                                                correlative_match_splat)
from gridmap_slam_tpu.types import Odom, Scan


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    lo = np.zeros((120, 120), np.float32)
    occ = rng.randint(5, 115, (80, 2))
    lo[occ[:, 0], occ[:, 1]] = 2.0
    fr = rng.randint(5, 115, (400, 2))
    lo[fr[:, 0], fr[:, 1]] -= 1.5
    field, unknown = likelihood_field(jnp.asarray(lo), gaussian_kernel(1., 3))
    llf = log_likelihood_field(field, unknown, 0.9, 10.0)

    n = 60
    angles = np.linspace(-np.pi, np.pi, n, endpoint=False)
    dists = 1.0 + 1.2 * np.abs(np.sin(3 * angles)) + rng.uniform(0, 0.2, n)
    scan = Scan.from_arrays(angles, dists, np.ones(n, bool), max_beams=64)
    return llf, scan


def test_splat_scores_equal_gather_scores(setup):
    llf, scan = setup
    res, origin = 0.05, (-3.0, -3.0)
    pose = jnp.asarray([0.35, -0.2, 0.4], jnp.float32)
    px, py = scan_points(scan)
    use = scan.valid & scan.hit

    wx = 4
    dxs = jnp.asarray([i * res for i in range(-wx, wx + 1)], jnp.float32)
    dts = jnp.asarray([0.0, 0.1], jnp.float32)
    want = np.asarray(_stage_scores(
        llf, px, py, use, pose, dxs, dxs, dts, resolution=res,
        origin=origin, z_hit=0.9, max_range=10.0))

    pad, margin = wx + 2, wx
    hp, wp = 120 + 2 * pad, 120 + 2 * pad
    fpad = _pad_field(llf, pad + margin, math.log(1 / 10.0))
    offs = [(oy, ox) for oy in range(-wx, wx + 1)
            for ox in range(-wx, wx + 1)]
    got = []
    for dt in (0.0, 0.1):
        e = _splat(px, py, use.astype(jnp.float32), pose[2] + dt, 0.0, 0.0,
                   hp=hp, wp=wp, pad=pad, resolution=res, origin=origin,
                   pose_xy=(pose[0], pose[1]))
        s = _window_scores(fpad, e, [o[0] for o in offs],
                           [o[1] for o in offs], he=hp, we=wp, margin=margin)
        got.append(np.asarray(s).reshape(2 * wx + 1, 2 * wx + 1))
    np.testing.assert_allclose(np.stack(got), want, atol=2e-3)


def test_splat_match_equals_gather_match(setup):
    """End-to-end: both implementations refine to the same pose."""
    llf, scan = setup
    res, origin = 0.05, (-3.0, -3.0)
    pose = jnp.asarray([0.35, -0.2, 0.4], jnp.float32)
    odom = Odom(d_center=jnp.float32(0.1), d_theta=jnp.float32(0.05))
    motion = SlamConfig().motion
    # coarse_halfres off: the splat backend has no half-res basin stage,
    # and this test pins schedule-identical equality
    mc = MatcherConfig(impl="gather", coarse_halfres=False)

    bp_g, s_g = correlative_match(
        llf, scan, pose, odom, matcher_cfg=mc, motion_cfg=motion,
        resolution=res, origin=origin, max_range=10.0, prior_center=pose)
    bp_s, s_s = correlative_match_splat(
        llf, scan, pose, odom, matcher_cfg=mc, motion_cfg=motion,
        resolution=res, origin=origin, max_range=10.0, prior_center=pose)
    np.testing.assert_allclose(np.asarray(bp_s), np.asarray(bp_g), atol=5e-3)
    np.testing.assert_allclose(float(s_s), float(s_g), atol=0.2)


def test_out_of_map_beams_score_ll_outside(setup):
    """Endpoints far outside the map contribute log(1/max_range) in both
    implementations (the splat clamps into a constant border)."""
    llf, scan = setup
    res, origin = 0.05, (-3.0, -3.0)
    pose = jnp.asarray([20.0, 20.0, 0.0], jnp.float32)  # everything outside
    odom = Odom(d_center=jnp.float32(0.0), d_theta=jnp.float32(0.0))
    motion = SlamConfig().motion
    mc = MatcherConfig(impl="gather", prior_weight=0.0)
    _, s_s = correlative_match_splat(
        llf, scan, pose, odom, matcher_cfg=mc, motion_cfg=motion,
        resolution=res, origin=origin, max_range=10.0)
    n_used = float(np.sum(np.asarray(scan.valid & scan.hit)))
    np.testing.assert_allclose(float(s_s), n_used * math.log(1 / 10.0),
                               rtol=1e-5)
