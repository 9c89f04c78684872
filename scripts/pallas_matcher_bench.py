"""On-silicon bench: Pallas matcher stage kernel vs the matmul backend.

Escalates gently (tunnel chip wedges on faulted kernels): small-P
correctness of each stage shape first — a Mosaic failure surfaces as a
compile error before any big run — then marginal timing (fori_loop trip
differencing, RTT cancelled) at full particle count for:

  - coarse stage (nearest, strided beams, 11x9x9)
  - fine stage   (bilinear, all beams, 5x5x5)
  - the full 3-stage batched match (correlative_match_pallas_batch)
  - the matmul-backend equivalents (bf16 default and f32)

Usage: python scripts/pallas_matcher_bench.py [--particles 500] [--full]
"""

import argparse
import json
import math
import statistics
import sys
import time
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
    ap.add_argument("--skip-coarse", action="store_true")
    ap.add_argument("--skip-full", action="store_true")
    args = ap.parse_args()

    from gridmap_slam_tpu import SlamConfig
    from gridmap_slam_tpu.ops.matcher import correlative_match
    from gridmap_slam_tpu.ops.pallas.matcher import (
        correlative_match_pallas_batch, pad_llfield_batch,
        stage_scores_pallas_batch)
    from gridmap_slam_tpu.types import Odom, Scan

    cfg = SlamConfig()         # reference parity: 120x120 map @ 5 cm
    mc = cfg.matcher
    res = float(cfg.map.resolution)
    origin = (float(cfg.map.origin[0]), float(cfg.map.origin[1]))
    maxr = cfg.sensor.max_range
    ll_out = math.log(1.0 / maxr)

    rng = np.random.default_rng(0)
    b = args.beams
    ang = np.sort(rng.uniform(-np.pi, np.pi, b))
    dist = rng.uniform(0.3, 4.0, b)
    px = jnp.asarray((dist * np.cos(ang)).astype(np.float32))
    py = jnp.asarray((dist * np.sin(ang)).astype(np.float32))
    use = jnp.asarray(rng.uniform(size=b) > 0.1)
    scan = Scan(angle=jnp.asarray(ang, jnp.float32),
                dist=jnp.asarray(dist, jnp.float32),
                hit=use, valid=jnp.ones((b,), bool))
    odom = Odom(d_center=jnp.asarray(0.05, jnp.float32),
                d_theta=jnp.asarray(0.02, jnp.float32))

    def problem(p):
        llf = jnp.asarray(rng.normal(-1.5, 0.5,
                                     (p, cfg.map.cells_y, cfg.map.cells_x))
                          .astype(np.float32))
        poses = jnp.asarray(np.stack(
            [rng.uniform(-2.0, 2.0, p), rng.uniform(-2.0, 2.0, p),
             rng.uniform(-np.pi, np.pi, p)], -1).astype(np.float32))
        return llf, poses

    out = {"particles": args.particles,
           "platform": jax.devices()[0].platform}

    wt = math.radians(mc.window_theta_deg)
    c_off = tuple(np.linspace(-mc.window_xy, mc.window_xy, mc.coarse_nxy))
    c_off_t = tuple(np.linspace(-wt, wt, mc.coarse_nt))
    f_off = tuple(np.linspace(-0.05, 0.05, mc.fine_nxy))
    f_off_t = tuple(np.linspace(-wt / 5, wt / 5, mc.fine_nt))
    stride = mc.coarse_beam_stride

    # ---- correctness at small P, fine (bilinear) stage first ----
    llf_s, poses_s = problem(8)
    fpad_s, hp, wp = pad_llfield_batch(llf_s, ll_out)
    from gridmap_slam_tpu.ops.matcher import _stage_scores

    def check(name, nearest, offs, offs_t, pxx, pyy, uss):
        try:
            got = stage_scores_pallas_batch(
                fpad_s, pxx, pyy, uss, poses_s, jnp.zeros((8, 3)),
                offs_x=offs, offs_y=offs, offs_t=offs_t,
                resolution=res, origin=origin, pad=2, hp=hp, wp=wp,
                nearest=nearest)
            ref = jax.vmap(lambda f, p: _stage_scores(
                f, pxx, pyy, uss, p, jnp.asarray(offs, jnp.float32),
                jnp.asarray(offs, jnp.float32),
                jnp.asarray(offs_t, jnp.float32),
                resolution=res, origin=origin, z_hit=mc.z_hit,
                max_range=maxr, nearest=nearest))(llf_s, poses_s)
            err = float(np.max(np.abs(np.asarray(got) - np.asarray(ref))))
            out[f"{name}_ok"] = bool(err < 1e-3)
            out[f"{name}_maxerr"] = err
        except Exception as e:  # noqa: BLE001
            out[f"{name}_ok"] = False
            out[f"{name}_error"] = repr(e)[:400]
        print(json.dumps(out), flush=True)

    check("fine", False, f_off, f_off_t, px, py, use)
    if not args.skip_coarse:
        check("coarse", True, c_off, c_off_t,
              px[::stride], py[::stride], use[::stride])

    # ---- marginal timing at full P ----
    p = args.particles
    llf, poses = problem(p)
    eps = jnp.float32(1e-30)

    def fine_pallas(f):
        fpad, hp2, wp2 = pad_llfield_batch(f, ll_out)
        s = stage_scores_pallas_batch(
            fpad, px, py, use, poses, jnp.zeros((p, 3)),
            offs_x=f_off, offs_y=f_off, offs_t=f_off_t,
            resolution=res, origin=origin, pad=2, hp=hp2, wp=wp2,
            nearest=False)
        return f + eps * jnp.sum(s)

    if out.get("fine_ok"):
        out["fine_pallas_ms"] = round(marginal_ms(fine_pallas, llf,
                                                  args.reps), 2)
        print(json.dumps(out), flush=True)

    if out.get("coarse_ok"):
        def coarse_pallas(f):
            fpad, hp2, wp2 = pad_llfield_batch(f, ll_out)
            s = stage_scores_pallas_batch(
                fpad, px[::stride], py[::stride], use[::stride], poses,
                jnp.zeros((p, 3)), offs_x=c_off, offs_y=c_off,
                offs_t=c_off_t, resolution=res, origin=origin, pad=2,
                hp=hp2, wp=wp2, nearest=True)
            return f + eps * jnp.sum(s)
        out["coarse_pallas_ms"] = round(marginal_ms(coarse_pallas, llf,
                                                    args.reps), 2)
        print(json.dumps(out), flush=True)

    # matmul-backend stage equivalents for comparison
    import dataclasses

    def match_ms(impl, bf16, prep):
        mcfg = dataclasses.replace(mc, impl=impl, matmul_bf16=bf16)

        def body(f):
            if prep == "pallas":
                best, sc = correlative_match_pallas_batch(
                    f, scan, poses, odom, matcher_cfg=mcfg,
                    motion_cfg=cfg.motion, resolution=res, origin=origin,
                    max_range=maxr, prior_center_b=poses)
            else:
                best, sc = jax.vmap(lambda ll, p0: correlative_match(
                    ll, scan, p0, odom, matcher_cfg=mcfg,
                    motion_cfg=cfg.motion, resolution=res, origin=origin,
                    max_range=maxr, prior_center=p0))(f, poses)
            return f + eps * (jnp.sum(best) + jnp.sum(sc))
        return round(marginal_ms(body, llf, args.reps), 2)

    if not args.skip_full:
        if out.get("fine_ok") and out.get("coarse_ok", True):
            try:
                out["match_pallas_ms"] = match_ms("pallas", False, "pallas")
            except Exception as e:  # noqa: BLE001
                out["match_pallas_error"] = repr(e)[:400]
            print(json.dumps(out), flush=True)
        out["match_matmul_bf16_ms"] = match_ms("matmul", True, "vmap")
        print(json.dumps(out), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
