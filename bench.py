"""Benchmark harness: LiDAR scans/sec/chip for the TPU-native SLAM engine.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference is single-threaded Java with no published numbers
(BASELINE.md); as the closest runnable proxy we time the NumPy oracle port of
the same per-particle math (oracle/numpy_ref.py) on this host and scale it to
the benchmarked particle count.  vs_baseline = our scans/s / oracle scans/s.

Usage:
  python bench.py                 # full: oracle baseline + TPU benchmark
  python bench.py --particles 10000 --frames 20
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_log(n_frames: int, beams: int, seed: int = 0):
    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log,
                                               square_path_controls)
    params = SimParams(beams_per_rev=beams)
    return simulate_log(default_world(), square_path_controls(n_frames),
                        params=params, seed=seed)


def time_oracle(frames, n_particles: int, n_frames: int,
                max_probe: int = 500) -> tuple[float, int]:
    """Oracle (reference-math proxy) scans/sec.

    Measured at min(n_particles, max_probe) particles — the reference's own
    operating point is 500 (slam/SLAM.java:50), so parity-scale runs are
    MEASURED, not extrapolated.  Beyond max_probe the per-particle loop is
    scaled linearly and the returned probe count (< n_particles) flags the
    number as an extrapolation in the output JSON.

    Returns (scans_per_sec_at_n_particles, probe_particles)."""
    from gridmap_slam_tpu.oracle.numpy_ref import OracleSLAM
    probe_particles = min(max_probe, n_particles)
    o = OracleSLAM(num_particles=probe_particles)
    # warm one frame, then time the rest
    f = frames[0]
    o.update(f.angle, f.dist, f.hit, f.d_center, f.d_theta)
    t0 = time.perf_counter()
    timed = frames[1:1 + min(3, len(frames) - 1)]
    for f in timed:
        o.update(f.angle, f.dist, f.hit, f.d_center, f.d_theta)
    dt = (time.perf_counter() - t0) / len(timed)
    per_scan = dt * (n_particles / probe_particles)
    return 1.0 / per_scan, probe_particles


def time_engine(frames, n_particles: int, chunk: int,
                map_size: float = 6.0, shared_map: bool = False,
                seg_frames: int = 0) -> tuple[float, dict]:
    import jax
    from gridmap_slam_tpu import RBPF, SlamConfig
    from gridmap_slam_tpu.config import MapConfig
    from gridmap_slam_tpu.io import frames_to_device

    cfg = SlamConfig(num_particles=n_particles, max_beams=192,
                     particle_chunk=chunk,
                     map=MapConfig(width_m=map_size, height_m=map_size,
                                   resolution=0.05,
                                   origin=(-map_size / 2, -map_size / 2)))
    if shared_map:
        from gridmap_slam_tpu.models.shared import SharedMapSLAM
    eng = SharedMapSLAM(cfg) if shared_map else RBPF(cfg)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    replay = eng.replay_jit()
    n = len(frames)

    def run(state):
        """Replay the whole log: one lax.scan dispatch, or several
        fixed-size segments (--seg-frames) — the workaround for this dev
        chip's frames-x-particles-per-dispatch device fault (see
        docs/TPU_FAULT.md); still amortizes dispatch latency over seg
        frames."""
        if seg_frames and n > seg_frames:
            assert n % seg_frames == 0, (n, seg_frames)
            infos = None
            for s0 in range(0, n, seg_frames):
                sub = jax.tree.map(lambda a: a[s0:s0 + seg_frames], batch)
                state, infos = replay(state, sub)
            return state, infos
        return replay(state, batch)

    import jax.numpy as jnp

    def fence(state) -> float:
        """Force REAL completion: on the tunneled axon platform
        block_until_ready can return before execution finishes (round-2
        finding: it 'measured' 55k scans/s, >40 TFLOP/s of VPU work —
        physically impossible).  A host fetch of a scalar that depends on
        the whole step chain cannot lie."""
        return float(jnp.sum(state.log_weights))

    # compile + warm (donation consumes the state; re-init per run)
    state, infos = run(eng.init(jax.random.key(0)))
    fence(state)
    neff_last = float(infos.neff[-1])

    # timed: repeat whole-log runs until >= min_time wall for resolution
    min_time, max_reps = 2.0, 50
    reps = 0
    t0 = time.perf_counter()
    while True:
        state0 = eng.init(jax.random.key(reps))
        state, infos = run(state0)
        fence(state)
        reps += 1
        if time.perf_counter() - t0 >= min_time or reps >= max_reps:
            break
    dt = (time.perf_counter() - t0) / (n * reps)
    extra = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "neff": neff_last,
        "ms_per_scan": 1e3 * dt,
        "timed_reps": reps,
        "frames_per_run": n,
    }
    return 1.0 / dt, extra


def run_ladder(frames_arg: int, beams: int) -> int:
    """Default mode: escalate particle counts in SUBPROCESSES (small first),
    and report the largest size that completed.  The dev chip in this
    environment can wedge for hours on a fault, so each size is isolated and
    a failure stops escalation while keeping the best earlier result."""
    import os
    import subprocess

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_tpu")
    # (particles, chunk, frames): the dev chip faults when one dispatch
    # gathers more than ~20 GB (docs/TPU_FAULT.md) — marginal mode runs the
    # log once and 3x tiled in single dispatches, so particles x 3*frames
    # must stay under ~18k particle-frames (coarse-thinned matcher gathers
    # ~0.94 MB per particle-frame).
    # Ordered so already-compiled programs run first (compile cache in
    # JAX_COMPILATION_CACHE_DIR): a timeout on a fresh-compile rung then
    # still leaves the largest cached rung as the reported best.
    ladder = [
        (500, 250, 12),    # reference-parity config
        (4000, 250, 1),    # largest per-particle-map size under the
                           # dev chip's per-dispatch budget
        (2000, 250, 3),
    ]
    best = None
    for particles, chunk, n_frames in ladder:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--particles", str(particles), "--chunk", str(chunk),
               "--frames", str(n_frames), "--beams", str(beams),
               "--marginal",        # on-device rate, tunnel RTT cancelled
               "--skip-oracle"]
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=1800, env=env)
        except subprocess.TimeoutExpired:
            print(f"ladder: {particles}p timed out; stopping escalation",
                  file=sys.stderr)
            break
        if out.returncode != 0:
            print(f"ladder: {particles}p failed; stopping escalation",
                  file=sys.stderr)
            print(out.stderr[-500:], file=sys.stderr)
            break
        line = out.stdout.strip().splitlines()[-1]
        print(f"ladder: {line}", file=sys.stderr)
        if best is None or particles >= best[0]:
            best = (particles, line)
    if best is None:
        print(json.dumps({"metric": "lidar_scans_per_sec_per_chip",
                          "value": None, "unit": "scans/s",
                          "vs_baseline": None,
                          "error": "all ladder sizes failed"}))
        return 1
    print(best[1])
    return 0


def time_engine_marginal(frames, n_particles: int, chunk: int,
                         map_size: float = 6.0, shared_map: bool = False,
                         k: int = 3) -> tuple[float, dict]:
    """On-device per-scan rate with dispatch overhead cancelled.

    The relay tunnel costs ~27 ms per dispatch round-trip on this dev chip
    (measured: 26.7 ms median, 1.6 ms stdev — docs/TPU_FAULT.md "jitter"),
    swamping sub-ms on-device compute.  Measure two SINGLE-dispatch replays — the
    log once and the log tiled k times — at identical dispatch counts; the
    time difference divided by the extra frames is the marginal on-device
    per-scan cost (what production runtimes without the tunnel would see),
    and the intercept estimates the tunnel round-trip."""
    import jax
    import jax.numpy as jnp
    from gridmap_slam_tpu import RBPF, SlamConfig
    from gridmap_slam_tpu.config import MapConfig
    from gridmap_slam_tpu.io import frames_to_device

    cfg = SlamConfig(num_particles=n_particles, max_beams=192,
                     particle_chunk=chunk,
                     map=MapConfig(width_m=map_size, height_m=map_size,
                                   resolution=0.05,
                                   origin=(-map_size / 2, -map_size / 2)))
    if shared_map:
        from gridmap_slam_tpu.models.shared import SharedMapSLAM
    eng = SharedMapSLAM(cfg) if shared_map else RBPF(cfg)
    b1 = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    bk = jax.tree.map(lambda a: jnp.concatenate([a] * k, axis=0), b1)
    replay = eng.replay_jit()
    n = len(frames)

    def timed(batch, reps=8):
        """Median of `reps` dispatch+fence round-trips (rep 0 compiles).
        The tunnel RTT dominates and jitters; the median over several
        dispatches makes the few-ms on-device marginal resolvable."""
        import statistics
        ts = []
        for r in range(reps + 1):
            s0 = eng.init(jax.random.key(r))
            float(jnp.sum(s0.log_weights))  # fence init
            t0 = time.perf_counter()
            s, _ = replay(s0, batch)
            float(jnp.sum(s.log_weights))   # fence run
            if r > 0:
                ts.append(time.perf_counter() - t0)
        return statistics.median(ts), statistics.pstdev(ts)

    t1, sd1 = timed(b1)
    tk, sdk = timed(bk)
    per_scan = max(tk - t1, 1e-9) / ((k - 1) * n)
    extra = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "ms_per_scan_marginal": 1e3 * per_scan,
        "dispatch_overhead_s": round(t1 - n * per_scan, 3),
        "dispatch_jitter_ms": round(1e3 * max(sd1, sdk), 1),
        "frames_short": n, "frames_long": k * n,
    }
    return 1.0 / per_scan, extra


def time_engine_blocked(frames, n_particles: int, chunk: int,
                        map_size: float = 6.0, block: int = 16000
                        ) -> tuple[float, dict]:
    """Shared-map engine with the multi-dispatch blocked step — the mode
    that RUNS at 100k-1M particles on the dev chip (each block dispatch
    stays under the ~20 GB gather budget, docs/TPU_FAULT.md).  Wall rate
    pays the ~27 ms tunnel RTT once per block dispatch; production runtimes
    would use the single-dispatch step."""
    import jax
    import jax.numpy as jnp
    from gridmap_slam_tpu import SlamConfig
    from gridmap_slam_tpu.config import MapConfig
    from gridmap_slam_tpu.io import frame_at, frames_to_device
    from gridmap_slam_tpu.models.shared import SharedMapSLAM

    cfg = SlamConfig(num_particles=n_particles, max_beams=192,
                     particle_chunk=0,
                     map=MapConfig(width_m=map_size, height_m=map_size,
                                   resolution=0.05,
                                   origin=(-map_size / 2, -map_size / 2)))
    eng = SharedMapSLAM(cfg)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    n = len(frames)
    state = eng.init(jax.random.key(0))
    # warm/compile one scan
    state, info = eng.step_blocked(state, frame_at(batch, 0), block)
    float(jnp.sum(state.log_weights))
    t0 = time.perf_counter()
    for i in range(1, n):
        state, info = eng.step_blocked(state, frame_at(batch, i), block)
    float(jnp.sum(state.log_weights))
    dt = (time.perf_counter() - t0) / max(n - 1, 1)
    extra = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "neff": float(info.neff),
        "ms_per_scan": 1e3 * dt,
        "block": block,
        "dispatches_per_scan": 2 + n_particles // block,
    }
    return 1.0 / dt, extra


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=None)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--beams", type=int, default=180)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--map-size", type=float, default=6.0)
    ap.add_argument("--shared-map", action="store_true",
                    help="shared-map mode (BASELINE config 3 style)")
    ap.add_argument("--seg-frames", type=int, default=0,
                    help="replay in fixed segments of this many frames "
                         "(0 = whole log in one dispatch); workaround for "
                         "the dev chip's per-dispatch fault, docs/TPU_FAULT.md")
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--marginal", action="store_true",
                    help="report the ON-DEVICE marginal per-scan rate "
                         "(tunnel dispatch overhead cancelled; see "
                         "time_engine_marginal)")
    ap.add_argument("--blocked", type=int, default=0, metavar="BLOCK",
                    help="shared-map blocked step: BLOCK particles per "
                         "dispatch (the 100k-1M mode on the dev chip)")
    ap.add_argument("--preset",
                    choices=["parity", "pr1", "chip", "mega", "city"],
                    default=None,
                    help="parity: 500p/6m (reference workload); pr1: "
                         "100p/20m; chip: 10k p; mega: 1M p shared map; "
                         "city: 1M p shared 200x200 m grid (BASELINE 3)")
    args = ap.parse_args()
    if args.preset == "parity":
        args.particles, args.map_size, args.chunk = 500, 6.0, 250
    elif args.preset == "pr1":
        args.particles, args.map_size, args.chunk = 100, 20.0, 0
    elif args.preset == "chip":
        args.particles, args.map_size, args.chunk = 10_000, 6.0, 500
        args.seg_frames = args.seg_frames or 4
    elif args.preset == "mega":
        args.particles, args.map_size, args.chunk = 1_000_000, 6.0, 1000
        args.shared_map = True
        args.seg_frames = args.seg_frames or 4
    elif args.preset == "city":
        args.particles, args.map_size, args.chunk = 1_000_000, 200.0, 1000
        args.shared_map = True
        args.seg_frames = args.seg_frames or 4

    if args.particles is None and args.preset is None:
        sys.exit(run_ladder(args.frames, args.beams))
    if args.particles is None:
        args.particles = 10_000

    frames, _ = build_log(args.frames, args.beams)

    if args.skip_oracle:
        oracle_sps, oracle_probe = None, None
    else:
        oracle_sps, oracle_probe = time_oracle(frames, args.particles,
                                               args.frames)

    if args.blocked:
        sps, extra = time_engine_blocked(frames, args.particles, args.chunk,
                                         map_size=args.map_size,
                                         block=args.blocked)
    elif args.marginal:
        sps, extra = time_engine_marginal(frames, args.particles, args.chunk,
                                          map_size=args.map_size,
                                          shared_map=args.shared_map)
    else:
        sps, extra = time_engine(frames, args.particles, args.chunk,
                                 map_size=args.map_size,
                                 shared_map=args.shared_map,
                                 seg_frames=args.seg_frames)

    # Baselines (the reference publishes no numbers, BASELINE.md):
    # (a) MEASURED: the NumPy oracle port of the reference per-particle math
    #     on this host, timed at min(P, 500) particles (500 = the
    #     reference's own config) and scaled only above that;
    # (b) ASSUMED: a deliberately generous 1.0 scans/s for the
    #     single-threaded Java implementation at 500 particles, scaled
    #     inversely with particle count.  This is an assumption, not a
    #     measurement — reported separately and labeled as such.
    # vs_baseline uses the LARGER of the two (the harder comparison).
    java_assumed = 1.0 * 500.0 / args.particles
    baseline = max(java_assumed, oracle_sps or 0.0)

    result = {
        "metric": f"lidar_scans_per_sec_per_chip@{args.particles}p",
        "value": round(sps, 3),
        "unit": "scans/s",
        "vs_baseline": round(sps / baseline, 2),
        "baseline_oracle_scans_per_sec":
            round(oracle_sps, 4) if oracle_sps else None,
        "baseline_oracle_probe_particles": oracle_probe,
        "baseline_oracle_extrapolated":
            (oracle_probe is not None and oracle_probe < args.particles)
            or None,
        "baseline_java_assumed_scans_per_sec": round(java_assumed, 4),
    }
    # extra diagnostics on stderr so stdout stays one JSON line
    print(json.dumps(extra), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
