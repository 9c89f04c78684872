"""Scan-likelihood surface (ops/surface.py + SharedMapSLAM.step_surface):
the precomputed correlation volume must equal direct pose scoring at its
grid points, and the surface-mode filter must localize end-to-end."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gridmap_slam_tpu.config import MapConfig, SensorConfig, SlamConfig
from gridmap_slam_tpu.ops.geometry import scan_points
from gridmap_slam_tpu.ops.grid import gaussian_kernel, likelihood_field
from gridmap_slam_tpu.ops.matcher import log_likelihood_field, score_pose
from gridmap_slam_tpu.ops.surface import (crop_center_cells,
                                          refine_on_surface, sample_surface,
                                          scan_surface,
                                          splat_endpoint_kernels)
from gridmap_slam_tpu.types import Scan


RES = 0.1
ORIGIN = (-3.0, -3.0)
MAX_RANGE = 5.0


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(2)
    lo = np.zeros((60, 60), np.float32)
    occ = rng.randint(3, 57, (60, 2))
    lo[occ[:, 0], occ[:, 1]] = 2.0
    fr = rng.randint(3, 57, (300, 2))
    lo[fr[:, 0], fr[:, 1]] -= 1.5
    field, unknown = likelihood_field(jnp.asarray(lo), gaussian_kernel(1., 3))
    llf = log_likelihood_field(field, unknown, 0.9, MAX_RANGE)

    n = 48
    angles = np.linspace(-np.pi, np.pi, n, endpoint=False)
    dists = 0.8 + 0.9 * np.abs(np.sin(2 * angles))
    hits = np.ones(n, bool)
    hits[::11] = False
    scan = Scan.from_arrays(angles, dists, hits, max_beams=64)
    return llf, scan


def _build_volume(llf, scan, thetas, crop=None):
    px, py = scan_points(scan)
    wgt = (scan.valid & scan.hit).astype(jnp.float32)
    kc = int(math.ceil(MAX_RANGE / RES)) + 2
    e = splat_endpoint_kernels(px, py, wgt, thetas, kc, RES)
    llf_c = llf if crop is None else crop
    return scan_surface(llf_c, e, math.log(1.0 / MAX_RANGE))


def test_surface_equals_score_pose_at_grid_points(setup):
    llf, scan = setup
    thetas = jnp.asarray([-0.3, 0.0, 0.45], jnp.float32)
    c_vol = np.asarray(_build_volume(llf, scan, thetas))
    assert c_vol.shape == (3, 60, 60)

    for it, iy, ix in [(0, 10, 12), (1, 30, 30), (2, 45, 20), (1, 0, 59)]:
        pose = jnp.asarray([ORIGIN[0] + (ix + 0.5) * RES,
                            ORIGIN[1] + (iy + 0.5) * RES,
                            float(thetas[it])], jnp.float32)
        want = float(score_pose(llf, scan, pose, z_hit=0.9, resolution=RES,
                                origin=ORIGIN, max_range=MAX_RANGE))
        np.testing.assert_allclose(c_vol[it, iy, ix], want, atol=2e-3)


def test_sample_surface_exact_at_grid_and_interpolates(setup):
    llf, scan = setup
    thetas = jnp.asarray([-0.2, 0.0, 0.2], jnp.float32)
    c_vol = _build_volume(llf, scan, thetas)
    kw = dict(theta0=-0.2, dtheta=0.2, crop_iy0=0, crop_ix0=0,
              resolution=RES, origin=ORIGIN)
    pose = jnp.asarray([[ORIGIN[0] + 20.5 * RES, ORIGIN[1] + 15.5 * RES,
                         0.0]], jnp.float32)
    got = float(sample_surface(c_vol, pose, **kw)[0])
    np.testing.assert_allclose(got, float(c_vol[1, 15, 20]), rtol=1e-6)
    # halfway between two cells -> mean of the two samples
    pose2 = pose.at[0, 0].add(0.5 * RES)
    got2 = float(sample_surface(c_vol, pose2, **kw)[0])
    np.testing.assert_allclose(
        got2, 0.5 * float(c_vol[1, 15, 20] + c_vol[1, 15, 21]), rtol=1e-6)


def test_refine_climbs_to_local_max(setup):
    llf, scan = setup
    thetas = jnp.asarray([0.0], jnp.float32)
    c_vol = _build_volume(llf, scan, thetas)
    kw = dict(theta0=0.0, dtheta=1.0, crop_iy0=0, crop_ix0=0,
              resolution=RES, origin=ORIGIN)
    # start two cells off the volume's argmax; refinement must improve score
    flat = int(np.argmax(np.asarray(c_vol)[0]))
    iy, ix = divmod(flat, 60)
    start = jnp.asarray([[ORIGIN[0] + (ix + 2 + 0.5) * RES,
                          ORIGIN[1] + (iy + 0.5) * RES, 0.0]], jnp.float32)
    s0 = sample_surface(c_vol, start, **kw)
    p1, s1 = refine_on_surface(c_vol, start, s0, steps=3, **kw)
    assert float(s1[0]) >= float(s0[0])
    assert float(s1[0]) == pytest.approx(float(np.asarray(c_vol)[0].max()),
                                         abs=1e-3)


def test_crop_center_clamps():
    iy0, ix0 = crop_center_cells(jnp.asarray([0.0, 0.0]), (20, 20), (60, 60),
                                 RES, ORIGIN)
    assert (int(iy0), int(ix0)) == (20, 20)
    iy0, ix0 = crop_center_cells(jnp.asarray([-10.0, 99.0]), (20, 20),
                                 (60, 60), RES, ORIGIN)
    assert (int(iy0), int(ix0)) == (40, 0)


def test_shared_surface_mode_localizes():
    """End-to-end: SharedMapSLAM.step_surface on a synthetic log."""
    from gridmap_slam_tpu.io import frame_at, frames_to_device
    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log,
                                               square_path_controls)
    from gridmap_slam_tpu.models.shared import SharedMapSLAM
    from gridmap_slam_tpu.utils.metrics import ate_rmse

    frames, gt = simulate_log(default_world(), square_path_controls(10),
                              params=SimParams(beams_per_rev=90), seed=5)
    cfg = SlamConfig(
        num_particles=256, max_beams=96,
        sensor=SensorConfig(max_range=MAX_RANGE),
        map=MapConfig(width_m=6.0, height_m=6.0, resolution=RES,
                      origin=ORIGIN),
    ).with_overrides({"matcher.surface_nt": 13})
    eng = SharedMapSLAM(cfg)
    state = eng.init(jax.random.key(0))
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    step = jax.jit(eng.step_surface)
    traj = []
    for i in range(len(frames)):
        state, info = step(state, frame_at(batch, i))
        traj.append(np.asarray(info.weighted_pose))
    ate = ate_rmse(np.stack(traj), gt)
    assert np.isfinite(np.asarray(state.log_weights)).all()
    # overwrite-weights semantics make Neff winner-take-all between
    # resamples (score spreads ~30 log-units); sanity only
    assert float(info.neff) >= 1.0
    assert ate < 0.2, ate


def test_shared_surface_crop_mode_localizes():
    """Cropped volume (city-style): same run with a 40-cell crop window."""
    from gridmap_slam_tpu.io import frame_at, frames_to_device
    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log,
                                               square_path_controls)
    from gridmap_slam_tpu.models.shared import SharedMapSLAM
    from gridmap_slam_tpu.utils.metrics import ate_rmse

    frames, gt = simulate_log(default_world(), square_path_controls(10),
                              params=SimParams(beams_per_rev=90), seed=5)
    cfg = SlamConfig(
        num_particles=128, max_beams=96,
        sensor=SensorConfig(max_range=MAX_RANGE),
        map=MapConfig(width_m=8.0, height_m=8.0, resolution=RES,
                      origin=(-4.0, -4.0)),
    ).with_overrides({"matcher.surface_nt": 13,
                      "matcher.surface_crop_cells": 40})
    eng = SharedMapSLAM(cfg)
    state = eng.init(jax.random.key(0))
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    step = jax.jit(eng.step_surface)
    traj = []
    for i in range(len(frames)):
        state, info = step(state, frame_at(batch, i))
        traj.append(np.asarray(info.weighted_pose))
    ate = ate_rmse(np.stack(traj), gt)
    assert np.isfinite(np.asarray(state.log_weights)).all()
    assert ate < 0.25, ate


def test_shared_surface_pure_mcl_refine0_localizes():
    """refine_steps=0 (pure MCL weighting, the 1M-particle bench mode):
    localization must still hold at moderate particle count."""
    from gridmap_slam_tpu.io import frame_at, frames_to_device
    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log,
                                               square_path_controls)
    from gridmap_slam_tpu.models.shared import SharedMapSLAM
    from gridmap_slam_tpu.utils.metrics import ate_rmse

    frames, gt = simulate_log(default_world(), square_path_controls(10),
                              params=SimParams(beams_per_rev=90), seed=5)
    cfg = SlamConfig(
        num_particles=1024, max_beams=96,
        sensor=SensorConfig(max_range=MAX_RANGE),
        map=MapConfig(width_m=6.0, height_m=6.0, resolution=RES,
                      origin=ORIGIN),
    ).with_overrides({"matcher.surface_nt": 13,
                      "matcher.surface_refine_steps": 0})
    eng = SharedMapSLAM(cfg)
    state = eng.init(jax.random.key(0))
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    step = jax.jit(eng.step_surface)
    traj = []
    for i in range(len(frames)):
        state, info = step(state, frame_at(batch, i))
        traj.append(np.asarray(info.weighted_pose))
    ate = ate_rmse(np.stack(traj), gt)
    assert np.isfinite(np.asarray(state.log_weights)).all()
    assert ate < 0.25, ate


def test_scan_surface_fft_matches_direct(setup):
    """FFT correlation equals the direct conv within f32 FFT tolerance."""
    llf, scan = setup
    thetas = jnp.asarray([-0.2, 0.1, 0.3], jnp.float32)
    px, py = scan_points(scan)
    wgt = (scan.valid & scan.hit).astype(jnp.float32)
    kc = int(math.ceil(MAX_RANGE / RES)) + 2
    e = splat_endpoint_kernels(px, py, wgt, thetas, kc, RES)
    c_direct = np.asarray(scan_surface(llf, e, math.log(1.0 / MAX_RANGE)))
    c_fft = np.asarray(scan_surface(llf, e, math.log(1.0 / MAX_RANGE),
                                    fft=True))
    np.testing.assert_allclose(c_fft, c_direct, atol=5e-2)
    assert np.mean(np.abs(c_fft - c_direct)) < 5e-3


def test_packed_sampling_matches_taps():
    """pack_neighborhoods + one 8-wide gather == the 8-scalar-tap trilinear
    sample, including clamped out-of-range poses and full-circle wrap."""
    import math
    from gridmap_slam_tpu.ops.surface import (pack_neighborhoods,
                                              sample_surface)
    rng = np.random.RandomState(3)
    nt, hc, wc = 9, 24, 20
    vol = jnp.asarray(rng.randn(nt, hc, wc).astype(np.float32))
    poses = jnp.asarray(np.stack([
        rng.uniform(-2.0, 2.0, 500),          # deliberately past the crop
        rng.uniform(-2.0, 2.0, 500),
        rng.uniform(-7.0, 7.0, 500)], -1).astype(np.float32))
    for wrap in (False, True):
        dtheta = (2 * math.pi / nt) if wrap else 0.1
        kw = dict(theta0=-math.pi if wrap else -0.4, dtheta=dtheta,
                  crop_iy0=2, crop_ix0=3, resolution=0.05,
                  origin=(-1.0, -1.0), wrap_theta=wrap)
        want = sample_surface(vol, poses, **kw)
        got = sample_surface(vol, poses, packed=pack_neighborhoods(vol, wrap),
                             **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-5)


def test_surface_mode_tracks_bench_log():
    """End-to-end surface-mode TRACKING regression — the test class whose
    absence let the birth-frame bug ship (every shared-map mode tracked a
    rotated world for two rounds; only throughput was measured).  512
    particles, 12 scans incl. the square path's turn phase; ATE must stay
    in the same class as the matcher modes."""
    import jax
    from gridmap_slam_tpu import SlamConfig
    from gridmap_slam_tpu.io import frame_at, frames_to_device
    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log,
                                               square_path_controls)
    from gridmap_slam_tpu.models.shared import SharedMapSLAM
    from gridmap_slam_tpu.utils.metrics import ate_rmse

    frames, gt = simulate_log(default_world(), square_path_controls(12),
                              params=SimParams(beams_per_rev=180), seed=0)
    cfg = SlamConfig(num_particles=512, max_beams=192)
    eng = SharedMapSLAM(cfg)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    step = jax.jit(eng.step_surface)
    state = eng.init(jax.random.key(0))
    traj = []
    for i in range(12):
        state, info = step(state, frame_at(batch, i))
        traj.append(np.asarray(info.weighted_pose))
    ate = ate_rmse(np.stack(traj), gt[:12])
    assert ate < 0.15, ate
    # weights were informative after scan 0 (no degenerate-uniform argmax)
    assert float(info.neff) < 0.95 * cfg.num_particles


def test_surface_volume_croplocal_field_matches_full_build():
    """The round-5 crop-local field build (surface_volume builds the
    likelihood field only over crop + blur radius) must reproduce the
    full-map field build EXACTLY on the crop window — interior crops get
    the full blur halo; crops clamped at the world edge coincide with the
    blur's zero boundary."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gridmap_slam_tpu import SlamConfig
    from gridmap_slam_tpu.config import MapConfig, SensorConfig
    from gridmap_slam_tpu.io import frame_at, frames_to_device
    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log,
                                               square_path_controls)
    from gridmap_slam_tpu.models.shared import SharedMapSLAM, surface_volume
    from gridmap_slam_tpu.ops.geometry import deskew_scan
    from gridmap_slam_tpu.ops.grid import likelihood_field
    from gridmap_slam_tpu.ops.matcher import log_likelihood_field
    from gridmap_slam_tpu.ops.surface import crop_center_cells

    cfg = SlamConfig(
        num_particles=8, max_beams=96, sensor=SensorConfig(max_range=4.0),
        map=MapConfig(width_m=16.0, height_m=10.0, resolution=0.1,
                      origin=(-8.0, -5.0)),
    ).with_overrides({"matcher.surface_nt": 5,
                      "matcher.surface_crop_cells": 48})
    eng = SharedMapSLAM(cfg)
    frames, _ = simulate_log(default_world(), square_path_controls(3),
                             params=SimParams(beams_per_rev=90), seed=3)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)

    # build some map content first
    state = eng.init(jax.random.key(0))
    step = jax.jit(eng.step_surface)
    for i in range(2):
        state, _ = step(state, frame_at(batch, i))

    frame = frame_at(batch, 2)
    scan = deskew_scan(frame.scan, frame.odom)
    # interior center AND a center clamped at the world edge
    for center in (jnp.asarray([0.3, -0.2, 0.1], jnp.float32),
                   jnp.asarray([-7.9, -4.9, 0.0], jnp.float32)):
        c_vol, kw, kc = jax.jit(
            lambda lo, c: surface_volume(cfg, eng.kernel, lo, scan, c)
        )(state.logodds, center)

        # reference: full-map field, then slice the crop
        field, unknown = likelihood_field(state.logodds, eng.kernel)
        llf = log_likelihood_field(field, unknown, cfg.matcher.z_hit,
                                   cfg.sensor.max_range)
        h, w = llf.shape
        iy0, ix0 = crop_center_cells(center[:2], (48, 48), (h, w),
                                     cfg.map.resolution,
                                     cfg.map.origin)
        from gridmap_slam_tpu.ops.surface import (scan_surface,
                                                  splat_endpoint_kernels)
        from gridmap_slam_tpu.ops.geometry import scan_points
        import math
        llf_crop = jax.lax.dynamic_slice(llf, (iy0, ix0), (48, 48))
        px, py = scan_points(scan)
        wgt = (scan.valid & scan.hit).astype(jnp.float32)
        thetas = kw["theta0"] + kw["dtheta"] * jnp.arange(5,
                                                          dtype=jnp.float32)
        e = splat_endpoint_kernels(px, py, wgt, thetas, kc,
                                   cfg.map.resolution)
        want = scan_surface(llf_crop, e,
                            math.log(1.0 / cfg.sensor.max_range))
        np.testing.assert_allclose(np.asarray(c_vol), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)
