"""Chunked particle processing must be numerically identical to unchunked."""

import numpy as np
import jax
import pytest

from gridmap_slam_tpu import RBPF, SlamConfig
from gridmap_slam_tpu.config import MapConfig
from gridmap_slam_tpu.io import frames_to_device, frame_at
from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                           simulate_log)


def test_chunked_equals_unchunked():
    params = SimParams(beams_per_rev=60)
    frames, _ = simulate_log(default_world(), [(0.1, 0.0)] * 2,
                             params=params, seed=8)

    def run(chunk):
        cfg = SlamConfig(num_particles=16, max_beams=64,
                         particle_chunk=chunk,
                         map=MapConfig(width_m=4.0, height_m=4.0,
                                       resolution=0.05, origin=(-2.0, -2.0)))
        eng = RBPF(cfg)
        state = eng.init(jax.random.key(5))
        batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
        step = jax.jit(eng.step)
        # one step: on the fresh map the matcher argmax is uniquely anchored
        # by the prior, so chunked/unchunked must agree to float tolerance
        # (further steps can tie-flip argmaxes on ~1e-6 reassociation noise)
        state, info = step(state, frame_at(batch, 0))
        return np.asarray(state.poses), np.asarray(state.logodds), \
            float(info.neff)

    p0, m0, n0 = run(0)
    p4, m4, n4 = run(4)
    np.testing.assert_allclose(p0, p4, atol=1e-5)
    np.testing.assert_allclose(m0, m4, atol=1e-4)
    assert abs(n0 - n4) < 1e-2


def test_config_overrides():
    cfg = SlamConfig()
    over = SlamConfig.parse_overrides(
        ["num_particles=64", "map.resolution=0.1", "matcher.z_hit=0.95",
         "accumulate_weights=true"])
    c2 = cfg.with_overrides(over)
    assert c2.num_particles == 64
    assert abs(c2.map.resolution - 0.1) < 1e-9
    assert abs(c2.matcher.z_hit - 0.95) < 1e-9
    assert c2.accumulate_weights is True
    # original untouched (frozen dataclasses)
    assert cfg.num_particles == 500


def test_accumulate_weights_mode():
    """SIS weighting (accumulate_weights=True) runs, stays finite, and
    resets weights to uniform on resample."""
    params = SimParams(beams_per_rev=60)
    frames, _ = simulate_log(default_world(), [(0.1, 0.0)] * 3,
                             params=params, seed=8)
    cfg = SlamConfig(num_particles=8, max_beams=64, accumulate_weights=True,
                     resample_fraction=1.01,       # force resample each step
                     map=MapConfig(width_m=4.0, height_m=4.0,
                                   resolution=0.05, origin=(-2.0, -2.0)))
    eng = RBPF(cfg)
    state = eng.init(jax.random.key(0))
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    step = jax.jit(eng.step)
    for i in range(3):
        state, info = step(state, frame_at(batch, i))
        assert bool(info.resampled)
        lw = np.asarray(state.log_weights)
        np.testing.assert_allclose(lw, 0.0)        # uniform reset
    assert np.isfinite(float(info.neff))
