"""Init-from-map-checkpoint: localization in a known map."""

import numpy as np
import jax
import pytest

from gridmap_slam_tpu import RBPF, SlamConfig
from gridmap_slam_tpu.io import (frames_to_device, frame_at,
                                 read_map_checkpoint, write_map_checkpoint)
from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                           simulate_log)


def test_localize_in_prebuilt_map(tmp_path):
    params = SimParams(beams_per_rev=90)
    frames, gt = simulate_log(default_world(), [(0.12, 0.0)] * 6,
                              params=params, seed=11)
    cfg = SlamConfig(num_particles=10, max_beams=96)
    eng = RBPF(cfg)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    step = jax.jit(eng.step)

    # build a map with the first 4 scans
    state = eng.init(jax.random.key(0))
    for i in range(4):
        state, info = step(state, frame_at(batch, i))
    built = np.asarray(eng.best_map(state))

    # checkpoint it through the reference format
    p = tmp_path / "map.ckpt"
    write_map_checkpoint(p, dict(width_m=6.0, height_m=6.0, resolution=0.05,
                                 origin=(-3.0, -3.0)), built)
    _, loaded = read_map_checkpoint(p)

    # resume from the checkpoint at the scan-4 pose and keep tracking
    state2 = eng.init_from_map(jax.random.key(1), loaded,
                               pose=np.asarray(info.weighted_pose))
    for i in range(4, 6):
        state2, info2 = step(state2, frame_at(batch, i))
    wp = np.asarray(info2.weighted_pose)
    assert np.linalg.norm(wp[:2] - gt[5][:2]) < 0.25


def test_init_from_map_shape_check():
    cfg = SlamConfig(num_particles=3)
    eng = RBPF(cfg)
    try:
        eng.init_from_map(jax.random.key(0), np.zeros((10, 10)))
        assert False, "expected shape assertion"
    except AssertionError:
        pass
