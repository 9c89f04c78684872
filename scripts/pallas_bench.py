"""Pallas-vs-XLA on-silicon bench for the two fused kernels.

Runs the LL-field kernel (ops/pallas/likelihood.py, gather-free) and the
map-update kernel (ops/pallas/grid_update.py, 8-row chunked gathers) on the
real TPU: correctness vs the XLA paths first at small P, then marginal
timing (two fori_loop trip counts, RTT cancelled) at the full particle
count.  Prints one JSON line with ms per call for each implementation.

Usage: GRIDMAP_PALLAS=1 python scripts/pallas_bench.py [--particles 500]
"""

import argparse
import json
import statistics
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, arg, reps=5):
    ts = []
    for r in range(reps + 1):
        t0 = time.perf_counter()
        out = fn(arg)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        if r:
            ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def marginal_ms(body, x, reps=5, n1=2, n2=6):
    def loop(n):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, n, lambda i, c: body(c), x)
        return run
    t1 = timed(loop(n1), x, reps)
    t2 = timed(loop(n2), x, reps)
    return 1e3 * max(t2 - t1, 1e-9) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=500)
    ap.add_argument("--beams", type=int, default=180)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from gridmap_slam_tpu import SlamConfig
    from gridmap_slam_tpu.config import MapConfig
    from gridmap_slam_tpu.io import frame_at, frames_to_device
    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log,
                                               square_path_controls)
    from gridmap_slam_tpu.ops.geometry import deskew_scan
    from gridmap_slam_tpu.ops.grid import gaussian_kernel, likelihood_field
    from gridmap_slam_tpu.ops.matcher import log_likelihood_field
    from gridmap_slam_tpu.ops.pallas.grid_update import (
        integrate_scan_pallas, scan_bin_tables)
    from gridmap_slam_tpu.ops.pallas.likelihood import (
        log_likelihood_field_pallas)
    from gridmap_slam_tpu.ops.raycast import build_beam_lut, integrate_scan

    # TPU-aligned config: 128x128 map @ 5 cm.
    cfg = SlamConfig(num_particles=args.particles, max_beams=192,
                     map=MapConfig(width_m=6.4, height_m=6.4,
                                   resolution=0.05, origin=(-3.2, -3.2)))
    h, w = cfg.map.cells_y, cfg.map.cells_x
    kernel = gaussian_kernel(cfg.map.likelihood_sigma,
                             cfg.map.likelihood_radius)
    kernel_tuple = tuple(float(k) for k in kernel)
    res = float(cfg.map.resolution)
    origin = (float(cfg.map.origin[0]), float(cfg.map.origin[1]))

    frames, _ = simulate_log(default_world(), square_path_controls(3),
                             params=SimParams(beams_per_rev=args.beams),
                             seed=0)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    frame = frame_at(batch, 1)
    scan = deskew_scan(frame.scan, frame.odom)
    lut = build_beam_lut(scan, cfg.beam_lut_bins)
    bins = scan_bin_tables(scan, cfg.beam_lut_bins)

    rng = np.random.RandomState(0)
    p_small = 8
    lo_small = jnp.asarray(
        rng.randn(p_small, h, w).astype(np.float32) * 1.5)
    poses_small = jnp.asarray(
        rng.uniform(-1, 1, (p_small, 3)).astype(np.float32))

    out = {"particles": args.particles,
           "platform": jax.devices()[0].platform}

    # ---- correctness at small P (compiles the kernels; a Mosaic failure
    # surfaces here as a compile error, before any big run) ----
    def ll_xla(lo):
        def one(l):
            f, u = likelihood_field(l, kernel)
            return log_likelihood_field(f, u, cfg.matcher.z_hit,
                                        cfg.sensor.max_range)
        return jax.vmap(one)(lo)

    try:
        got = log_likelihood_field_pallas(
            lo_small, kernel_tuple=kernel_tuple, z_hit=cfg.matcher.z_hit,
            max_range=cfg.sensor.max_range)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(ll_xla(lo_small)),
                                   atol=2e-4)
        out["llfield_pallas_ok"] = True
    except Exception as e:  # noqa: BLE001
        out["llfield_pallas_ok"] = False
        out["llfield_pallas_error"] = repr(e)[:500]

    def integ_xla(lo, poses):
        return jax.vmap(lambda l, po: l + integrate_scan(
            l, po, scan, lut, resolution=res, origin=origin,
            l_free=cfg.sensor.l_free, l_occ=cfg.sensor.l_occ,
            tol_cells=cfg.sensor.hit_tolerance_cells))(lo, poses)

    try:
        got = integrate_scan_pallas(
            lo_small, poses_small, 1.0, *bins, resolution=res,
            origin=origin, l_free=cfg.sensor.l_free, l_occ=cfg.sensor.l_occ,
            tol_cells=cfg.sensor.hit_tolerance_cells)
        want = integ_xla(jnp.zeros_like(lo_small), poses_small)
        got0 = integrate_scan_pallas(
            jnp.zeros_like(lo_small), poses_small, 1.0, *bins,
            resolution=res, origin=origin, l_free=cfg.sensor.l_free,
            l_occ=cfg.sensor.l_occ,
            tol_cells=cfg.sensor.hit_tolerance_cells)
        # identical cell classification up to bearing-bin rounding: compare
        # the delta fields cellwise, allow a small disagreeing fraction at
        # wedge boundaries (atan2 minimax polynomial vs exact)
        diff = np.mean(np.abs(np.asarray(got0) - np.asarray(want)) > 1e-4)
        out["integrate_pallas_ok"] = bool(diff < 0.01)
        out["integrate_cell_disagreement"] = float(diff)
    except Exception as e:  # noqa: BLE001
        out["integrate_pallas_ok"] = False
        out["integrate_pallas_error"] = repr(e)[:500]

    # ---- timing at full P ----
    p = args.particles
    lo = jnp.asarray(rng.randn(p, h, w).astype(np.float32) * 1.5)
    poses = jnp.asarray(rng.uniform(-1, 1, (p, 3)).astype(np.float32))

    if out.get("llfield_pallas_ok"):
        out["llfield_xla_ms"] = round(marginal_ms(
            lambda l: ll_xla(l), lo, args.reps), 2)
        out["llfield_pallas_ms"] = round(marginal_ms(
            lambda l: log_likelihood_field_pallas(
                l, kernel_tuple=kernel_tuple, z_hit=cfg.matcher.z_hit,
                max_range=cfg.sensor.max_range), lo, args.reps), 2)
    if out.get("integrate_pallas_ok"):
        out["integrate_xla_ms"] = round(marginal_ms(
            lambda l: integ_xla(l, poses), lo, args.reps), 2)
        out["integrate_pallas_ms"] = round(marginal_ms(
            lambda l: integrate_scan_pallas(
                l, poses, 1.0, *bins, resolution=res, origin=origin,
                l_free=cfg.sensor.l_free, l_occ=cfg.sensor.l_occ,
                tol_cells=cfg.sensor.hit_tolerance_cells), lo,
            args.reps), 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
