"""Pallas kernel equivalence tests, interpret mode on CPU.

These validate kernel SEMANTICS only.  Mosaic compilation/execution on real
TPU hardware is exercised separately by the bench ladder's pallas rung
(scripts/tpu_ladder.sh, GRIDMAP_PALLAS=1 on a tile-aligned 128x128 map);
see docs/bench/pallas500.log for the latest hardware result."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridmap_slam_tpu.config import SlamConfig
from gridmap_slam_tpu.ops.grid import gaussian_kernel, likelihood_field
from gridmap_slam_tpu.ops.matcher import log_likelihood_field
from gridmap_slam_tpu.ops.pallas.grid_update import (integrate_scan_pallas,
                                                     scan_bin_tables)
from gridmap_slam_tpu.ops.pallas.likelihood import log_likelihood_field_pallas
from gridmap_slam_tpu.ops.raycast import build_beam_lut, integrate_scan
from gridmap_slam_tpu.types import Scan

H, W = 64, 128
RES = 0.05
ORIGIN = (-H * RES / 2, -W * RES / 2)  # note: origin args are (x, y)


def _scan(n=80, seed=0):
    rng = np.random.RandomState(seed)
    angles = np.linspace(-np.pi, np.pi, n, endpoint=False)
    dists = 0.6 + 0.8 * np.abs(np.sin(3 * angles)) + rng.uniform(0, 0.03, n)
    hits = rng.uniform(size=n) > 0.15
    return Scan.from_arrays(angles, dists, hits, max_beams=96)


def test_grid_update_matches_xla():
    cfg = SlamConfig()
    scan = _scan()
    lut = build_beam_lut(scan, 2048)
    poses = jnp.asarray([[0.1, -0.05, 0.3], [-0.2, 0.15, -1.2]], jnp.float32)
    logodds = jnp.asarray(
        np.random.RandomState(1).normal(size=(2, H, W)) * 0.5, jnp.float32)
    origin = (-3.2, -1.6)

    want = jax.vmap(lambda lo, p: lo + integrate_scan(
        lo, p, scan, lut, resolution=RES, origin=origin,
        l_free=cfg.sensor.l_free, l_occ=cfg.sensor.l_occ))(logodds, poses)

    tables = scan_bin_tables(scan, 2048)
    got = integrate_scan_pallas(
        logodds, poses, 1.0, *tables, resolution=RES, origin=origin,
        l_free=cfg.sensor.l_free, l_occ=cfg.sensor.l_occ, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_grid_update_keep_zero_is_identity():
    cfg = SlamConfig()
    scan = _scan()
    tables = scan_bin_tables(scan, 2048)
    logodds = jnp.asarray(
        np.random.RandomState(2).normal(size=(1, H, W)), jnp.float32)
    got = integrate_scan_pallas(
        logodds, jnp.zeros((1, 3), jnp.float32), 0.0, *tables,
        resolution=RES, origin=(-1.0, -1.0), l_free=cfg.sensor.l_free,
        l_occ=cfg.sensor.l_occ, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(logodds))


def test_likelihood_field_matches_xla():
    kernel = gaussian_kernel(1.0, 3)
    rng = np.random.RandomState(0)
    logodds = np.zeros((2, H, W), np.float32)
    occ = rng.randint(0, min(H, W), size=(40, 2))
    free = rng.randint(0, min(H, W), size=(200, 2))
    logodds[0, occ[:, 0], occ[:, 1]] = 2.2
    logodds[0, free[:, 0], free[:, 1]] = -0.9
    logodds[1, 10:20, 30:50] = -3.0
    logodds[1, 15, 40] = 5.0
    lo = jnp.asarray(logodds)

    def xla_ll(x):
        f, u = likelihood_field(x, kernel)
        return log_likelihood_field(f, u, 0.9, 10.0)

    want = jax.vmap(xla_ll)(lo)
    got = log_likelihood_field_pallas(
        lo, kernel_tuple=tuple(float(k) for k in kernel), z_hit=0.9,
        max_range=10.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_likelihood_field_blank_map_uniform():
    kernel = gaussian_kernel(1.0, 3)
    lo = jnp.zeros((1, H, W), jnp.float32)
    got = log_likelihood_field_pallas(
        lo, kernel_tuple=tuple(float(k) for k in kernel), z_hit=0.9,
        max_range=10.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               math.log(0.1) * np.ones((1, H, W)), atol=1e-5)


def test_grid_update_unaligned_map_self_pads():
    """Maps that are not (8, 128)-tile multiples (e.g. the reference's
    120-wide parity grid) run via the kernel's zero-pad + slice wrapper;
    per-cell independence makes the kept region match the XLA path up to
    the documented atan bin-boundary jitter."""
    cfg = SlamConfig()
    scan = _scan()
    lut = build_beam_lut(scan, 2048)
    tables = scan_bin_tables(scan, 2048)
    logodds = jnp.asarray(
        np.random.RandomState(3).normal(size=(2, 120, 120)) * 0.5,
        jnp.float32)
    poses = jnp.asarray([[0.1, -0.05, 0.3], [0.0, 0.0, 0.0]], jnp.float32)

    want = jax.vmap(lambda lo, p: lo + integrate_scan(
        lo, p, scan, lut, resolution=RES, origin=(-3.0, -3.0),
        l_free=cfg.sensor.l_free, l_occ=cfg.sensor.l_occ))(logodds, poses)
    got = integrate_scan_pallas(
        logodds, poses, 1.0, *tables, resolution=RES, origin=(-3.0, -3.0),
        l_free=cfg.sensor.l_free, l_occ=cfg.sensor.l_occ, interpret=True)
    frac = float((np.abs(np.asarray(got) - np.asarray(want)) > 1e-4).mean())
    assert got.shape == (2, 120, 120)
    assert frac < 5e-3, frac
