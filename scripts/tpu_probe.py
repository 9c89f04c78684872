"""TPU fault bisection probe (VERDICT.md round-1 item #1).

Runs ONE named stage of the RBPF step at a given particle count on the real
TPU and exits 0/1.  Driven by scripts/tpu_bisect.sh in subprocesses so a
device fault can't wedge the session.

Stages:
  sanity     - big matmul (device health)
  alloc      - allocate the (P,H,W) log-odds tensor + trivial elementwise op
  llfield    - likelihood_field + log_likelihood_field vmapped over P maps
  matcher    - correlative_match vmapped over P particles on one shared field
  integrate  - integrate_scan vmapped over P particles
  resample   - systematic resample gather over the (P,H,W) map tensor
  step       - one full RBPF.step jitted (no lax.scan)
  replay     - full replay (lax.scan over frames), as bench.py does
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage")
    ap.add_argument("--particles", type=int, default=2000)
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--beams", type=int, default=180)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device={dev} platform={dev.platform}", file=sys.stderr)

    if args.stage == "sanity":
        x = jnp.ones((2048, 2048), jnp.bfloat16)
        y = jax.jit(lambda a: (a @ a).sum())(x)
        jax.block_until_ready(y)
        print(f"sanity ok: {float(y)}")
        return 0

    if args.stage == "precision":
        # Round-3 finding: TPU matmuls at DEFAULT precision truncate f32
        # INPUTS to bf16 (preferred_element_type only fixes accumulation).
        # This probe measures it and verifies the two fixes the engine
        # relies on: HIGHEST is f32-true, and one-sided (DEFAULT, HIGHEST)
        # makes one-hot selection BIT-exact (ops/raycast.py).
        import numpy as np
        rng = np.random.RandomState(0)
        a = rng.randn(256, 256).astype(np.float32)
        b = rng.randn(256, 256).astype(np.float32)
        ref = (a.astype(np.float64) @ b.astype(np.float64)).astype(np.float32)
        oh = np.zeros((128, 256), np.float32)
        oh[np.arange(128), rng.randint(0, 256, 128)] = 1.0
        t = rng.randn(256, 128).astype(np.float32) * 3
        sel_ref = oh @ t
        out = {}
        for tag, prec in [
                ("default", "default"), ("highest", "highest"),
                ("onesided", (jax.lax.Precision.DEFAULT,
                              jax.lax.Precision.HIGHEST))]:
            g = np.asarray(jax.jit(
                lambda x, y, p=prec: jax.lax.dot(x, y, precision=p))(a, b))
            s = np.asarray(jax.jit(
                lambda x, y, p=prec: jax.lax.dot(x, y, precision=p))(oh, t))
            out[tag] = {
                "rel_err": float(np.abs(g - ref).max() / np.abs(ref).max()),
                "onehot_max_err": float(np.abs(s - sel_ref).max()),
            }
        print(json.dumps(out))
        bad = out["default"]["rel_err"] < 1e-5       # platform NOT truncating
        exact = out["onesided"]["onehot_max_err"] == 0.0
        print(f"default-is-bf16: {not bad}; onesided one-hot exact: {exact}",
              file=sys.stderr)
        return 0 if exact else 1

    if args.stage == "rngonly":
        # Isolate the PRNG: a lax.scan over --frames steps, each splitting
        # --particles keys and sampling one normal per particle, no map
        # traffic at all.  If this faults at the same particles-x-frames
        # boundary as the full step, the per-dispatch budget is RNG calls.
        p, f = args.particles, args.frames

        @jax.jit
        def run(key):
            def body(k, _):
                k, km = jax.random.split(k)
                keys = jax.random.split(km, p)
                z = jax.vmap(lambda kk: jax.random.normal(kk, (3,)))(keys)
                return k, z.sum()
            k, sums = jax.lax.scan(body, key, None, length=f)
            return sums.sum()

        out = run(jax.random.key(0))
        print(f"rngonly p={p} f={f} ok sum={float(out):.3e}")
        return 0

    if args.stage == "jitter":
        # Dispatch round-trip statistics: the same tiny cached program
        # dispatched+fenced N times.  Tells whether on-device times (<=25 ms
        # under the gather budget) are resolvable through the tunnel.
        f = jax.jit(lambda a: (a * 2.0 + 1.0).sum())
        x = jnp.ones((128, 128), jnp.float32)
        float(f(x))                      # compile+warm
        ts = []
        for _ in range(args.frames or 12):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        import statistics
        print(f"jitter n={len(ts)} min={min(ts)*1e3:.1f}ms "
              f"median={statistics.median(ts)*1e3:.1f}ms "
              f"max={max(ts)*1e3:.1f}ms "
              f"stdev={statistics.pstdev(ts)*1e3:.1f}ms")
        return 0

    if args.stage == "dlgather":
        # Gather-traffic loop: --chunk iterations, each gathering 128M
        # elements (0.5 GB) from a 64 MB table with data-dependent indices.
        # Discriminates a budget on GATHERED bytes from plain HBM traffic
        # (the elementwise 'deadline' probes pass at 320 GB).
        iters = args.chunk or 40
        table = jnp.arange(16 * 1024 * 1024, dtype=jnp.float32)  # 64 MB
        idx0 = jax.random.randint(jax.random.key(1), (128 * 1024 * 1024,),
                                  0, table.shape[0], jnp.int32)

        def body(i, carry):
            s, idx = carry
            g = jnp.take(table, idx, axis=0)
            return s + g[::1024 * 1024].sum(), (idx + 1) % table.shape[0]

        def run(idx):
            s, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), idx))
            return s

        out = jax.jit(run)(idx0)
        print(f"dlgather iters={iters} (~{iters * 0.5:.0f} GB gathered) ok "
              f"sum={float(out):.3e}")
        return 0

    if args.stage == "deadline":
        # Content-independent long dispatch: loops of elementwise passes
        # over a 256 MB array (0.5 GB traffic/iter, ~0.7 ms/iter at HBM BW)
        # or of 4096^3 matmuls (~0.7 ms/iter, compute-bound).  --chunk is
        # reused as the iteration count; --beams picks the flavor
        # (0 = traffic, 1 = matmul).  If dispatches above some duration
        # crash regardless of content, the device has an execution
        # deadline, not a volume budget.
        iters = args.chunk or 40
        if args.beams == 1:
            a = jnp.ones((4096, 4096), jnp.bfloat16)

            def body(i, x):
                return (x @ a) * 1e-3

            out = jax.jit(lambda x: jax.lax.fori_loop(0, iters, body, x))(a)
        else:
            a = jnp.ones((64, 1024, 1024), jnp.float32)   # 256 MB

            def body(i, x):
                return x * 1.0000001 + 1e-9

            out = jax.jit(lambda x: jax.lax.fori_loop(0, iters, body, x))(a)
        t0 = time.perf_counter()
        s = float(out.sum())      # force real completion (host fetch)
        print(f"deadline iters={iters} flavor={args.beams} ok "
              f"sum={s:.3e} fetch={time.perf_counter()-t0:.2f}s")
        return 0

    from gridmap_slam_tpu import RBPF, SlamConfig
    from gridmap_slam_tpu.io import frames_to_device
    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log,
                                               square_path_controls)

    p = args.particles
    cfg = SlamConfig(num_particles=p, max_beams=192,
                     particle_chunk=args.chunk)
    eng = RBPF(cfg)
    h, w = cfg.map.cells_y, cfg.map.cells_x

    frames, _ = simulate_log(default_world(),
                             square_path_controls(args.frames),
                             params=SimParams(beams_per_rev=args.beams),
                             seed=0)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)

    def one_frame(batch, i=0):
        return jax.tree.map(lambda a: a[i], batch)

    t0 = time.perf_counter()
    if args.stage == "alloc":
        lo = jnp.zeros((p, h, w), jnp.float32)
        out = jax.jit(lambda a: (a + 1.0).sum())(lo)
        jax.block_until_ready(out)
    elif args.stage == "llfield":
        from gridmap_slam_tpu.ops.grid import likelihood_field
        from gridmap_slam_tpu.ops.matcher import log_likelihood_field
        lo = jnp.zeros((p, h, w), jnp.float32)

        def ll_one(m):
            f, u = likelihood_field(m, eng.kernel)
            return log_likelihood_field(f, u, cfg.matcher.z_hit,
                                        cfg.sensor.max_range)
        out = jax.jit(jax.vmap(ll_one))(lo)
        jax.block_until_ready(out)
        print(f"llfield shape {out.shape}", file=sys.stderr)
    elif args.stage == "matcher":
        from gridmap_slam_tpu.ops.matcher import correlative_match
        from gridmap_slam_tpu.ops.geometry import deskew_scan
        fr = one_frame(batch)
        scan = deskew_scan(fr.scan, fr.odom)
        llf = jnp.zeros((h, w), jnp.float32)
        poses = jnp.zeros((p, 3), jnp.float32)

        def m_one(pose):
            return correlative_match(
                llf, scan, pose, fr.odom, matcher_cfg=cfg.matcher,
                motion_cfg=cfg.motion, resolution=cfg.map.resolution,
                origin=cfg.map.origin, max_range=cfg.sensor.max_range)
        best, score = jax.jit(jax.vmap(m_one))(poses)
        jax.block_until_ready(score)
    elif args.stage == "integrate":
        from gridmap_slam_tpu.ops.geometry import deskew_scan
        from gridmap_slam_tpu.ops.raycast import build_beam_lut, integrate_scan
        fr = one_frame(batch)
        scan = deskew_scan(fr.scan, fr.odom)
        lut = build_beam_lut(scan, cfg.beam_lut_bins)
        lo = jnp.zeros((p, h, w), jnp.float32)
        poses = jnp.zeros((p, 3), jnp.float32)
        out = jax.jit(jax.vmap(lambda m, q: integrate_scan(
            m, q, scan, lut, resolution=cfg.map.resolution,
            origin=cfg.map.origin, l_free=cfg.sensor.l_free,
            l_occ=cfg.sensor.l_occ)))(lo, poses)
        jax.block_until_ready(out)
    elif args.stage == "resample":
        from gridmap_slam_tpu.ops.resample import systematic_indices
        lo = jnp.zeros((p, h, w), jnp.float32)
        lw = jnp.zeros((p,), jnp.float32)

        @jax.jit
        def rs(lo, lw, key):
            idx = systematic_indices(key, lw)
            return jnp.take(lo, idx, axis=0)
        out = rs(lo, lw, jax.random.key(0))
        jax.block_until_ready(out)
    elif args.stage == "step":
        fr = one_frame(batch)
        state = eng.init(jax.random.key(0))
        state, info = eng.step_jit(donate=False)(state, fr)
        jax.block_until_ready(state)
        print(f"neff={float(info.neff)}", file=sys.stderr)
    elif args.stage == "replay":
        replay = eng.replay_jit()
        state, infos = replay(eng.init(jax.random.key(0)), batch)
        jax.block_until_ready(state)
        print(f"neff={float(infos.neff[-1])}", file=sys.stderr)
    elif args.stage == "replay_nodonate":
        replay = jax.jit(eng.replay)          # no donation
        state, infos = replay(eng.init(jax.random.key(0)), batch)
        jax.block_until_ready(state)
        print(f"neff={float(infos.neff[-1])}", file=sys.stderr)
    elif args.stage == "segmented":
        # replay in fixed-size frame segments: several lax.scan dispatches
        # per log instead of one (workaround candidate for the
        # frames-x-particles device fault).
        seg = 4
        n = args.frames
        replay = eng.replay_jit()
        state = eng.init(jax.random.key(0))
        for s0 in range(0, n, seg):
            sub = jax.tree.map(lambda a: a[s0:s0 + seg], batch)
            state, infos = replay(state, sub)
        jax.block_until_ready(state)
        print(f"neff={float(infos.neff[-1])}", file=sys.stderr)
    elif args.stage == "benchlike":
        # exactly bench.time_engine's pattern: donated replay run TWICE with
        # a fresh init in between.
        replay = eng.replay_jit()
        state, infos = replay(eng.init(jax.random.key(0)), batch)
        jax.block_until_ready(state)
        print(f"first run neff={float(infos.neff[-1])}", file=sys.stderr)
        state0 = eng.init(jax.random.key(0))
        jax.block_until_ready(state0)
        state, infos = replay(state0, batch)
        jax.block_until_ready(state)
        print(f"second run neff={float(infos.neff[-1])}", file=sys.stderr)
    elif args.stage == "steploop":
        # python-loop of the jitted DONATED step (no lax.scan): isolates
        # scan-carry handling from per-step compute + donation.
        step = eng.step_jit(donate=True)
        state = eng.init(jax.random.key(0))
        for i in range(args.frames):
            state, info = step(state, one_frame(batch, i))
        jax.block_until_ready(state)
        print(f"neff={float(info.neff)}", file=sys.stderr)
    elif args.stage == "replay_noresample":
        cfg2 = cfg.replace(resample_fraction=0.0)   # resample branch never taken
        eng2 = RBPF(cfg2)
        replay = eng2.replay_jit()
        state, infos = replay(eng2.init(jax.random.key(0)), batch)
        jax.block_until_ready(state)
        print(f"neff={float(infos.neff[-1])}", file=sys.stderr)
    else:
        print(f"unknown stage {args.stage}", file=sys.stderr)
        return 2
    dt = time.perf_counter() - t0
    print(f"{args.stage} p={p} chunk={args.chunk} ok in {dt:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
