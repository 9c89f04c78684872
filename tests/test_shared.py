"""Shared-map SLAM mode tests."""

import numpy as np
import jax
import pytest

from gridmap_slam_tpu.config import MapConfig, SlamConfig
from gridmap_slam_tpu.models.shared import SharedMapSLAM
from gridmap_slam_tpu.io import frames_to_device, frame_at
from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                           simulate_log,
                                           square_path_controls)
from gridmap_slam_tpu.utils.metrics import ate_rmse


@pytest.fixture(scope="module")
def log():
    params = SimParams(beams_per_rev=90)
    return simulate_log(default_world(), square_path_controls(8),
                        params=params, seed=5)


def test_shared_map_replay(log):
    frames, gt = log
    cfg = SlamConfig(num_particles=64, max_beams=96, particle_chunk=32)
    eng = SharedMapSLAM(cfg)
    state = eng.init(jax.random.key(0))
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    step = jax.jit(eng.step)
    traj = []
    for i in range(len(frames)):
        state, info = step(state, frame_at(batch, i))
        traj.append(np.asarray(info.weighted_pose))
    traj = np.stack(traj)
    assert np.isfinite(traj).all()
    ate = ate_rmse(traj, gt)
    assert ate < 0.3, ate
    m = np.asarray(state.logodds)
    assert m.shape == (120, 120)
    assert (m > 0).sum() > 50 and (m < 0).sum() > 1000


def test_shared_map_replay_scan(log):
    """lax.scan replay compiles and matches the python loop."""
    frames, gt = log
    cfg = SlamConfig(num_particles=16, max_beams=96)
    eng = SharedMapSLAM(cfg)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)

    s1 = eng.init(jax.random.key(3))
    step = jax.jit(eng.step)
    for i in range(len(frames)):
        s1, _ = step(s1, frame_at(batch, i))

    s2, infos = eng.replay_jit()(eng.init(jax.random.key(3)), batch)
    np.testing.assert_allclose(np.asarray(s1.poses), np.asarray(s2.poses),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s1.logodds),
                                  np.asarray(s2.logodds))


def test_shared_map_memory_independent_of_particles():
    """State size scales with P only through poses/weights."""
    c1 = SlamConfig(num_particles=10)
    c2 = SlamConfig(num_particles=1000)
    s1 = SharedMapSLAM(c1).init(jax.random.key(0))
    s2 = SharedMapSLAM(c2).init(jax.random.key(0))
    assert s1.logodds.shape == s2.logodds.shape == (120, 120)
    assert s2.poses.shape == (1000, 3)


def test_step_blocked_matches_step():
    """step_blocked (multi-dispatch workaround for the dev chip's
    per-dispatch gather budget, docs/TPU_FAULT.md) is functionally
    identical to step under the same key."""
    import jax.numpy as jnp

    from gridmap_slam_tpu.io import frame_at, frames_to_device
    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log,
                                               square_path_controls)

    cfg = SlamConfig(num_particles=16, max_beams=64)
    eng = SharedMapSLAM(cfg)
    frames, _ = simulate_log(default_world(), square_path_controls(3),
                             params=SimParams(beams_per_rev=60), seed=3)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)

    s_ref = eng.init(jax.random.key(0))
    s_blk = eng.init(jax.random.key(0))
    step = jax.jit(eng.step)
    for i in range(3):
        f = frame_at(batch, i)
        s_ref, info_ref = step(s_ref, f)
        s_blk, info_blk = eng.step_blocked(s_blk, f, block=4)
    np.testing.assert_allclose(np.asarray(s_blk.poses),
                               np.asarray(s_ref.poses), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_blk.logodds),
                               np.asarray(s_ref.logodds), atol=1e-5)
    np.testing.assert_allclose(float(info_blk.neff), float(info_ref.neff),
                               rtol=1e-5)
