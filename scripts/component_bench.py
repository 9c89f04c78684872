"""Per-component on-device timing for the parity workload (500p RBPF).

Times each stage of the SLAM step in isolation — LL-field build, scan
matcher, map integration, resample gather — using the marginal-dispatch
method (two fori_loop trip counts, difference cancels the tunnel RTT;
docs/TPU_FAULT.md).  Identifies where the per-scan milliseconds go so
optimization effort lands on the real bottleneck.

Usage:  python scripts/component_bench.py [--particles 500] [--impl matmul]
"""

import argparse
import json
import math
import statistics
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed_dispatch(fn, arg, reps=5):
    """Median wall time of fn(arg) with a host-scalar fence (compile on
    rep 0, excluded)."""
    ts = []
    for r in range(reps + 1):
        t0 = time.perf_counter()
        out = fn(arg)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf))
        if r:
            ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def marginal(fn_short, fn_long, arg, n_short, n_long, reps=5):
    t1 = timed_dispatch(fn_short, arg, reps)
    t2 = timed_dispatch(fn_long, arg, reps)
    return max(t2 - t1, 1e-9) / (n_long - n_short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--impl", default="matmul")
    ap.add_argument("--beams", type=int, default=180)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from gridmap_slam_tpu import RBPF, SlamConfig
    from gridmap_slam_tpu.config import MapConfig
    from gridmap_slam_tpu.io import frame_at, frames_to_device
    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log,
                                               square_path_controls)
    from gridmap_slam_tpu.ops.geometry import deskew_scan
    from gridmap_slam_tpu.ops.grid import likelihood_field
    from gridmap_slam_tpu.ops.matcher import (correlative_match,
                                              log_likelihood_field)
    from gridmap_slam_tpu.ops.motion import apply_odometry
    from gridmap_slam_tpu.ops.raycast import build_beam_lut, integrate_scan
    from gridmap_slam_tpu.ops.resample import systematic_indices

    p = args.particles
    cfg = SlamConfig(num_particles=p, max_beams=192,
                     particle_chunk=args.chunk,
                     map=MapConfig()).with_overrides(
                         {"matcher.impl": args.impl})
    eng = RBPF(cfg)
    frames, _ = build_log = simulate_log(
        default_world(), square_path_controls(4),
        params=SimParams(beams_per_rev=args.beams), seed=0)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    frame = frame_at(batch, 1)

    state = eng.init(jax.random.key(0))
    # Run a couple of real steps so maps/fields are non-trivial.
    step = eng.step_jit(donate=False)
    for i in range(2):
        state, _ = step(state, frame_at(batch, i))
    scan = deskew_scan(frame.scan, frame.odom)
    lut = build_beam_lut(scan, cfg.beam_lut_bins)
    logodds = state.logodds
    res = float(cfg.map.resolution)
    origin = (float(cfg.map.origin[0]), float(cfg.map.origin[1]))

    def chunked(fn, x3, extra=None):
        """lax.map over particle chunks of a vmapped per-particle fn."""
        n_chunks = p // args.chunk
        xs = jax.tree.map(
            lambda a: a.reshape((n_chunks, args.chunk) + a.shape[1:]), x3)
        out = jax.lax.map(lambda c: jax.vmap(fn)(*c) if isinstance(c, tuple)
                          else jax.vmap(fn)(c), xs)
        return out.reshape((p,) + out.shape[2:]).astype(jnp.float32)

    def ll_one(lo):
        field, unknown = likelihood_field(lo, eng.kernel)
        return log_likelihood_field(field, unknown, cfg.matcher.z_hit,
                                    cfg.sensor.max_range)

    def loop(body, n):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, n, lambda i, c: body(c), x)
        return run

    results = {}

    # 1. LL field build (P maps -> P fields; feed output back as input)
    body = lambda lo: chunked(ll_one, lo)
    results["llfield_ms"] = 1e3 * marginal(loop(body, 2), loop(body, 6),
                                           logodds, 2, 6, args.reps)

    # 2. matcher (fixed fields, poses -> poses)
    llf = chunked(ll_one, logodds)
    odom = frame.odom

    def match_one(llf1, pose):
        best, _ = correlative_match(
            llf1, scan, pose, odom, matcher_cfg=cfg.matcher,
            motion_cfg=cfg.motion, resolution=res, origin=origin,
            max_range=cfg.sensor.max_range,
            prior_center=apply_odometry(pose, odom))
        return best

    def match_body(poses):
        n_chunks = p // args.chunk
        xs = (llf.reshape((n_chunks, args.chunk) + llf.shape[1:]),
              poses.reshape(n_chunks, args.chunk, 3))
        out = jax.lax.map(lambda c: jax.vmap(match_one)(*c), xs)
        return out.reshape(p, 3)

    results["matcher_ms"] = 1e3 * marginal(
        loop(match_body, 2), loop(match_body, 6), state.poses, 2, 6,
        args.reps)

    # 3. integration (poses fixed, logodds -> logodds)
    def integ_one(lo, pose):
        return lo + integrate_scan(lo, pose, scan, lut, resolution=res,
                                   origin=origin, l_free=cfg.sensor.l_free,
                                   l_occ=cfg.sensor.l_occ,
                                   tol_cells=cfg.sensor.hit_tolerance_cells)

    def integ_body(lo):
        n_chunks = p // args.chunk
        xs = (lo.reshape((n_chunks, args.chunk) + lo.shape[1:]),
              state.poses.reshape(n_chunks, args.chunk, 3))
        out = jax.lax.map(lambda c: jax.vmap(integ_one)(*c), xs)
        return out.reshape(lo.shape)

    results["integrate_ms"] = 1e3 * marginal(
        loop(integ_body, 2), loop(integ_body, 6), logodds, 2, 6, args.reps)

    # 4. resample gather of the map tensor
    def resample_body(args_):
        lo, lw = args_
        idx = systematic_indices(jax.random.key(1), lw)
        return jnp.take(lo, idx, axis=0), jnp.take(lw, idx, axis=0) - 0.01

    results["resample_ms"] = 1e3 * marginal(
        loop(resample_body, 1), loop(resample_body, 3),
        (logodds, state.log_weights), 1, 3, args.reps)

    # 5. whole step for reference
    def step_body(st):
        st2, _ = eng.step(st, frame)
        return st2

    results["full_step_ms"] = 1e3 * marginal(
        loop(step_body, 1), loop(step_body, 3), state, 1, 3, args.reps)

    results.update(particles=p, impl=args.impl,
                   platform=jax.devices()[0].platform)
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
