"""Map-sharded surface engine (parallel/surface_sharded.py) tests on the
8-device virtual CPU mesh — the round-5 composition of surface mode with
map tiling (round-4 VERDICT missing #1).

Equivalence strategy: the engine's RNG depends only on the 'p' axis index,
so runs that differ ONLY in map shards ('m') must produce (near-)identical
trajectories — isolating exactly the new machinery: tiled LL field, crop
assembly psum, theta-bin-sharded correlation, tile-local integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gridmap_slam_tpu.config import MapConfig, SensorConfig, SlamConfig
from gridmap_slam_tpu.models.shared import SharedMapSLAM
from gridmap_slam_tpu.parallel.mesh import make_mesh
from gridmap_slam_tpu.parallel.shmap import init_shmap, make_shmap_step
from gridmap_slam_tpu.parallel.surface_sharded import (
    init_surface_sharded, make_surface_sharded_step)
from gridmap_slam_tpu.io import frames_to_device, frame_at
from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                           simulate_log,
                                           square_path_controls)


def _cfg(p=32, crop=0):
    # 128 x 80 cells at 0.1 m: width divisible by 4 map shards; short
    # max_range keeps the endpoint-kernel K manageable on CPU
    cfg = SlamConfig(num_particles=p, max_beams=96,
                     sensor=SensorConfig(max_range=4.0),
                     map=MapConfig(width_m=12.8, height_m=8.0,
                                   resolution=0.1, origin=(-6.4, -4.0)))
    return cfg.with_overrides({"matcher.surface_nt": 7,
                               "matcher.surface_crop_cells": crop})


@pytest.fixture(scope="module")
def log():
    params = SimParams(beams_per_rev=90)
    return simulate_log(default_world(), square_path_controls(4),
                        params=params, seed=11)


def _run(cfg, mesh, frames, n=3, key=0):
    eng = SharedMapSLAM(cfg)
    state = init_surface_sharded(eng, jax.random.key(key), mesh)
    step = make_surface_sharded_step(eng, mesh)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    infos = []
    for i in range(n):
        state, info = step(state, frame_at(batch, i))
        infos.append(info)
    return state, infos


def test_sharded_surface_matches_unsharded_map(log):
    """m=4 (map in 32-cell column tiles, bins sharded, crop psum-assembled,
    tile-local integration) must reproduce m=1 (whole map per device) —
    same 'p' layout => identical RNG, so any deviation is the sharding
    machinery.  nt=7 on m=4 also exercises the padded-bin path."""
    frames, _ = log
    cfg = _cfg(32, crop=48)        # crop straddles tile boundaries
    s1, i1 = _run(cfg, make_mesh(1, map_shards=1), frames)
    s4, i4 = _run(cfg, make_mesh(4, map_shards=4), frames)
    np.testing.assert_allclose(np.asarray(s4.poses), np.asarray(s1.poses),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(s4.logodds),
                               np.asarray(s1.logodds), atol=1e-3)
    for a, b in zip(i1, i4):
        np.testing.assert_allclose(float(b.neff), float(a.neff), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(b.weighted_pose),
                                   np.asarray(a.weighted_pose), atol=2e-3)


def test_sharded_surface_matches_shmap_surface(log):
    """With m=1 the new engine must agree with the replicated-map shmap
    surface engine (same RNG layout over 'p'; the only implementation
    difference is the tiled LL-field build, which equals the dense build,
    and crop/bin bookkeeping that is trivial at m=1)."""
    frames, _ = log
    cfg = _cfg(32)
    mesh = make_mesh(8, map_shards=1)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)

    eng = SharedMapSLAM(cfg)
    sa = init_shmap(eng, jax.random.key(0), mesh)
    stepa = make_shmap_step(eng, mesh, surface=True)
    sb = init_surface_sharded(eng, jax.random.key(0), mesh)
    stepb = make_surface_sharded_step(eng, mesh)
    for i in range(3):
        sa, ia = stepa(sa, frame_at(batch, i))
        sb, ib = stepb(sb, frame_at(batch, i))
    np.testing.assert_allclose(np.asarray(sb.poses), np.asarray(sa.poses),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(ib.weighted_pose),
                               np.asarray(ia.weighted_pose), atol=2e-3)
    np.testing.assert_allclose(np.asarray(sb.logodds),
                               np.asarray(sa.logodds), atol=1e-3)


def test_sharded_surface_full_circle_and_freeze(log):
    """Full-circle theta grid (wrap taps) + freeze_map on the sharded
    engine: map must stay pristine, state finite."""
    frames, _ = log
    cfg = _cfg(32).with_overrides({
        "matcher.surface_theta_span_deg": 180.0,
        "matcher.surface_weight_temp": 0.2,
    }).replace(freeze_map=True)
    mesh = make_mesh(8, map_shards=4)
    eng = SharedMapSLAM(cfg)
    state = init_surface_sharded(eng, jax.random.key(0), mesh)
    lo = jnp.zeros_like(state.logodds).at[30:50, 40:90].set(1.5)
    state = state.replace(logodds=jax.device_put(lo,
                                                 state.logodds.sharding))
    before = np.asarray(state.logodds).copy()
    step = make_surface_sharded_step(eng, mesh)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    for i in range(2):
        state, info = step(state, frame_at(batch, i))
    np.testing.assert_array_equal(np.asarray(state.logodds), before)
    assert np.isfinite(float(info.neff))
    assert np.isfinite(np.asarray(state.poses)).all()


def test_sharded_surface_tracks(log):
    """End-to-end sanity: the sharded engine tracks the path and builds a
    map on the full ('p', 'm') = (2, 4) mesh."""
    frames, gt = log
    cfg = _cfg(64)
    mesh = make_mesh(8, map_shards=4)
    state, infos = _run(cfg, mesh, frames, n=len(frames))
    wp = np.asarray(infos[-1].weighted_pose)
    assert np.linalg.norm(wp[:2] - gt[len(infos) - 1][:2]) < 0.5
    m = np.asarray(state.logodds)
    assert (m > 0).sum() > 20 and (m < 0).sum() > 200
