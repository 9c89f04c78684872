"""Matmul matcher backend (ops/matcher_matmul.py): exact equivalence with
the gather backend — same candidate schedule (it reuses correlative_match's
control flow) and the same stage scores (two-tap one-hot matmuls compute
bilinear lookups literally), in both nearest and bilinear modes."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from gridmap_slam_tpu.config import MatcherConfig, SlamConfig
from gridmap_slam_tpu.ops.geometry import scan_points
from gridmap_slam_tpu.ops.grid import gaussian_kernel, likelihood_field
from gridmap_slam_tpu.ops.matcher import (_stage_scores, correlative_match,
                                          log_likelihood_field)
from gridmap_slam_tpu.ops.matcher_matmul import (pad_llfield,
                                                 stage_scores_matmul)
from gridmap_slam_tpu.types import Odom, Scan


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(1)
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
    hits = np.ones(n, bool)
    hits[::13] = False                      # some non-hit beams (masked)
    scan = Scan.from_arrays(angles, dists, hits, max_beams=64)
    return llf, scan


@pytest.mark.parametrize("nearest", [False, True])
def test_matmul_stage_scores_equal_gather(setup, nearest):
    llf, scan = setup
    res, origin = 0.05, (-3.0, -3.0)
    pose = jnp.asarray([0.35, -0.2, 0.4], jnp.float32)
    px, py = scan_points(scan)
    use = scan.valid & scan.hit

    dxs = jnp.asarray(np.linspace(-0.2, 0.2, 9), jnp.float32)
    dys = jnp.asarray(np.linspace(-0.15, 0.15, 7), jnp.float32)
    dts = jnp.asarray([-0.1, 0.0, 0.07], jnp.float32)
    want = np.asarray(_stage_scores(
        llf, px, py, use, pose, dxs, dys, dts, resolution=res,
        origin=origin, z_hit=0.9, max_range=10.0, nearest=nearest))

    pad = 2
    fpad = pad_llfield(llf, pad, math.log(1 / 10.0))
    got = np.asarray(stage_scores_matmul(
        fpad, px, py, use.astype(jnp.float32), pose, dxs, dys, dts,
        resolution=res, origin=origin, pad=pad, nearest=nearest))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_matmul_match_equals_gather_match(setup):
    """End-to-end correlative_match: impl='matmul' refines to the same pose
    and score as impl='gather' (identical schedule by construction)."""
    llf, scan = setup
    res, origin = 0.05, (-3.0, -3.0)
    pose = jnp.asarray([0.35, -0.2, 0.4], jnp.float32)
    odom = Odom(d_center=jnp.float32(0.1), d_theta=jnp.float32(0.05))
    motion = SlamConfig().motion

    for nearest in (True, False):
        mc_g = MatcherConfig(impl="gather", coarse_nearest=nearest)
        mc_m = MatcherConfig(impl="matmul", coarse_nearest=nearest,
                             matmul_bf16=False)
        bp_g, s_g = correlative_match(
            llf, scan, pose, odom, matcher_cfg=mc_g, motion_cfg=motion,
            resolution=res, origin=origin, max_range=10.0, prior_center=pose)
        bp_m, s_m = correlative_match(
            llf, scan, pose, odom, matcher_cfg=mc_m, motion_cfg=motion,
            resolution=res, origin=origin, max_range=10.0, prior_center=pose)
        np.testing.assert_allclose(np.asarray(bp_m), np.asarray(bp_g),
                                   atol=1e-4)
        np.testing.assert_allclose(float(s_m), float(s_g), atol=0.05)


def test_matmul_out_of_map_scores_ll_outside(setup):
    """Endpoints far outside the map read the constant ll_outside through
    the clamped pad band, matching the gather backend's per-corner check."""
    llf, scan = setup
    res, origin = 0.05, (-3.0, -3.0)
    pose = jnp.asarray([20.0, 20.0, 0.0], jnp.float32)
    odom = Odom(d_center=jnp.float32(0.0), d_theta=jnp.float32(0.0))
    motion = SlamConfig().motion
    mc = MatcherConfig(impl="matmul", prior_weight=0.0,
                       matmul_bf16=False)
    _, s_m = correlative_match(
        llf, scan, pose, odom, matcher_cfg=mc, motion_cfg=motion,
        resolution=res, origin=origin, max_range=10.0)
    n_used = float(np.sum(np.asarray(scan.valid & scan.hit)))
    np.testing.assert_allclose(float(s_m), n_used * math.log(1 / 10.0),
                               rtol=1e-5)


def test_matmul_straddles_map_border(setup):
    """A pose whose scan straddles the map edge: taps mix real field values
    and the ll_outside constant exactly like the gather backend."""
    llf, scan = setup
    res, origin = 0.05, (-3.0, -3.0)
    pose = jnp.asarray([-2.9, 0.1, 2.0], jnp.float32)   # near west border
    px, py = scan_points(scan)
    use = scan.valid & scan.hit
    dxs = jnp.asarray([-0.2, 0.0, 0.2], jnp.float32)
    dts = jnp.asarray([0.0], jnp.float32)
    want = np.asarray(_stage_scores(
        llf, px, py, use, pose, dxs, dxs, dts, resolution=res,
        origin=origin, z_hit=0.9, max_range=10.0))
    fpad = pad_llfield(llf, 2, math.log(1 / 10.0))
    got = np.asarray(stage_scores_matmul(
        fpad, px, py, use.astype(jnp.float32), pose, dxs, dxs, dts,
        resolution=res, origin=origin, pad=2))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_matmul_bf16_scores_close_and_same_argmax(setup):
    """bf16 GEMM scores stay within quantization tolerance of f32 and the
    refined pose lands within a cell of the f32 result."""
    llf, scan = setup
    res, origin = 0.05, (-3.0, -3.0)
    pose = jnp.asarray([0.35, -0.2, 0.4], jnp.float32)
    odom = Odom(d_center=jnp.float32(0.1), d_theta=jnp.float32(0.05))
    motion = SlamConfig().motion
    mc32 = MatcherConfig(impl="matmul", matmul_bf16=False)
    mc16 = MatcherConfig(impl="matmul", matmul_bf16=True)
    bp32, s32 = correlative_match(
        llf, scan, pose, odom, matcher_cfg=mc32, motion_cfg=motion,
        resolution=res, origin=origin, max_range=10.0, prior_center=pose)
    bp16, s16 = correlative_match(
        llf, scan, pose, odom, matcher_cfg=mc16, motion_cfg=motion,
        resolution=res, origin=origin, max_range=10.0, prior_center=pose)
    assert abs(float(s16) - float(s32)) < 1.5, (float(s16), float(s32))
    assert np.all(np.abs(np.asarray(bp16) - np.asarray(bp32))
                  < [0.06, 0.06, 0.03]), (bp16, bp32)


def test_matmul_bf16_e2e_ate():
    """Full SLAM run with the bf16 matcher: localization quality holds."""
    import jax
    from gridmap_slam_tpu import RBPF, SlamConfig
    from gridmap_slam_tpu.io import frame_at, frames_to_device
    from gridmap_slam_tpu.io.synthetic import (default_world, simulate_log,
                                               square_path_controls)
    from gridmap_slam_tpu.utils.metrics import ate_rmse

    frames, gt = simulate_log(default_world(), square_path_controls(12),
                              seed=3)
    cfg = SlamConfig(num_particles=16).with_overrides(
        {"matcher.impl": "matmul", "matcher.matmul_bf16": True})
    eng = RBPF(cfg)
    state = eng.init(jax.random.key(0))
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    step = eng.step_jit(donate=False)
    traj = []
    for i in range(len(frames)):
        state, info = step(state, frame_at(batch, i))
        traj.append(np.asarray(info.weighted_pose))
    ate = ate_rmse(np.stack(traj), gt)
    assert ate < 0.12, ate
