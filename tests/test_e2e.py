"""End-to-end replay test: tiny synthetic world -> RBPF -> ATE bound.

Mirrors the BASELINE config-1 shape at reduced scale to stay fast on the
2-core CI box (SURVEY.md §4 prescription: golden replay with ATE assertion).
"""

import numpy as np
import jax
import pytest

from gridmap_slam_tpu import RBPF, SlamConfig
from gridmap_slam_tpu.config import MapConfig
from gridmap_slam_tpu.io import frames_to_device, frame_at, write_recording, read_recording
from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                           simulate_log, square_path_controls)
from gridmap_slam_tpu.utils.metrics import ate_rmse


@pytest.fixture(scope="module")
def small_log():
    params = SimParams(beams_per_rev=90)
    frames, gt = simulate_log(default_world(), square_path_controls(8),
                              params=params, seed=7)
    return frames, gt


def test_replay_ate_bound(small_log, tmp_path):
    frames, gt = small_log
    # round-trip through the on-disk format first: the replay path must be
    # indistinguishable from live data (reference DataRecorder semantics)
    p = tmp_path / "log.rec"
    write_recording(p, frames)
    frames = read_recording(p)

    cfg = SlamConfig(num_particles=12, max_beams=96)
    eng = RBPF(cfg)
    state = eng.init(jax.random.key(0))
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    step = eng.step_jit()
    traj = []
    for i in range(len(frames)):
        state, info = step(state, frame_at(batch, i))
        traj.append(np.asarray(info.weighted_pose))
    traj = np.stack(traj)
    assert np.isfinite(traj).all()
    ate = ate_rmse(traj, gt)
    assert ate < 0.25, f"ATE {ate} exceeds bound"

    # map sanity: strongest particle carved a real map
    m = np.asarray(eng.best_map(state))
    assert (m > 0).sum() > 50
    assert (m < 0).sum() > 1000


def test_determinism(small_log):
    """Fixed PRNG key => bit-stable trajectory and maps (SURVEY.md §4)."""
    frames, _ = small_log
    cfg = SlamConfig(num_particles=6, max_beams=96)

    def run():
        eng = RBPF(cfg)
        state = eng.init(jax.random.key(42))
        batch = frames_to_device(frames[:4], cfg.max_beams,
                                 cfg.sensor.max_range)
        step = eng.step_jit()
        for i in range(4):
            state, info = step(state, frame_at(batch, i))
        return np.asarray(state.poses), np.asarray(state.logodds)

    p1, m1 = run()
    p2, m2 = run()
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(m1, m2)


def test_straight_traverse_heading_stays_locked():
    """Regression for the round-2 prior-centering fix: on a straight
    traverse the matcher's motion prior must be centered at the odometry
    pose (slam/GridMap.java:356), or sampled heading noise compounds into a
    window-edge rotation lock-in (two_rooms drift, docs/ate_parity_*)."""
    import jax
    import numpy as np

    from gridmap_slam_tpu import RBPF, SlamConfig
    from gridmap_slam_tpu.io import frame_at, frames_to_device
    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log)
    from gridmap_slam_tpu.utils.metrics import ate_rmse

    frames, gt = simulate_log(default_world(), [(0.15, 0.0)] * 10,
                              params=SimParams(beams_per_rev=90), seed=7,
                              start_pose=(-1.8, -1.5, 0.0))
    gt = gt.copy()
    gt[:, 0] += 1.8
    gt[:, 1] += 1.5
    cfg = SlamConfig(num_particles=24, max_beams=96)
    eng = RBPF(cfg)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    state = eng.init(jax.random.key(0))
    step = jax.jit(eng.step)
    traj = []
    for i in range(len(frames)):
        state, info = step(state, frame_at(batch, i))
        traj.append(np.asarray(info.weighted_pose))
    traj = np.stack(traj)
    assert abs(traj[-1, 2] - gt[-1, 2]) < 0.1, traj[-1]
    assert ate_rmse(traj, gt) < 0.15
