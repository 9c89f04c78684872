"""Multi-robot shared-map SLAM tests."""

import numpy as np
import jax
import pytest

from gridmap_slam_tpu.config import MapConfig, SlamConfig
from gridmap_slam_tpu.models.multi import MultiRobotSLAM
from gridmap_slam_tpu.io import frames_to_device
from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                           simulate_log)


def test_two_robots_fuse_one_map():
    world = default_world()
    params = SimParams(beams_per_rev=60)
    # robot A drives +x from the west side; robot B drives +y from the south
    fa, gta = simulate_log(world, [(0.15, 0.0)] * 6, params=params, seed=1,
                           start_pose=(-1.5, 0.0, 0.0))
    fb, gtb = simulate_log(world, [(0.15, 0.0)] * 6, params=params, seed=2,
                           start_pose=(0.0, -1.5, np.pi / 2))

    cfg = SlamConfig(num_particles=12, max_beams=64)
    eng = MultiRobotSLAM(cfg, num_robots=2)
    state = eng.init(jax.random.key(0),
                     poses=[(-1.5, 0.0, 0.0), (0.0, -1.5, np.pi / 2)])

    ba = frames_to_device(fa, cfg.max_beams, cfg.sensor.max_range)
    bb = frames_to_device(fb, cfg.max_beams, cfg.sensor.max_range)
    # stack to (T, R, ...)
    batch = jax.tree.map(lambda a, b: jax.numpy.stack([a, b], axis=1), ba, bb)

    state, infos = jax.jit(eng.replay)(state, batch)
    wp = np.asarray(infos.weighted_pose)       # (T, R, 3)
    assert np.isfinite(wp).all()
    # each robot tracked its own trajectory
    assert np.linalg.norm(wp[-1, 0, :2] - gta[-1][:2]) < 0.4
    assert np.linalg.norm(wp[-1, 1, :2] - gtb[-1][:2]) < 0.4
    # the shared map fused observations from both (free cells along +x from
    # west AND along +y from south)
    m = np.asarray(state.logodds)
    assert (m > 0).sum() > 50
    cx = (np.asarray([-0.5, 0.0]) - (-3.0)) / 0.05
    row_a = m[int(cx[1]), :]                   # y=0 row: robot A's corridor
    col_b = m[:, int(cx[1])]                   # x=0 col: robot B's corridor
    assert (row_a < 0).sum() > 20
    assert (col_b < 0).sum() > 20


def test_multi_robot_neff_per_robot():
    world = default_world()
    params = SimParams(beams_per_rev=60)
    fa, _ = simulate_log(world, [(0.1, 0.0)] * 2, params=params, seed=3)
    cfg = SlamConfig(num_particles=8, max_beams=64)
    eng = MultiRobotSLAM(cfg, num_robots=3)
    state = eng.init(jax.random.key(1))
    b = frames_to_device(fa, cfg.max_beams, cfg.sensor.max_range)
    batch = jax.tree.map(
        lambda a: jax.numpy.stack([a[0]] * 3, axis=0), b)  # same frame x3
    state, info = jax.jit(eng.step)(state, batch)
    assert np.asarray(info.neff).shape == (3,)
    assert np.isfinite(np.asarray(info.neff)).all()
