"""ATE parity: this engine vs the reference math (NumPy oracle) on one log.

BASELINE.json acceptance: "trajectories match the reference implementation
within its ATE bound on replayed logs".  The oracle (oracle/numpy_ref.py)
reimplements the reference's per-particle pipeline faithfully (DDA
integration, blur likelihood field, brute-force matcher, per-scan weights);
both consume the identical recording and are scored against simulator ground
truth.  The engine matches parity when its ATE <= oracle ATE + margin.

Usage:
  python scripts/ate_parity.py [--revs 12] [--particles 12] [--out f]
  python scripts/ate_parity.py --dataset maps/room_loop_40.rec \
      --particles 500 --oracle-particles 50     # canonical-dataset mode
The oracle's per-particle loop is ~0.25 s/particle/scan on this host, so
--oracle-particles bounds its cost at large engine particle counts (the
reference's own count is 500, slam/SLAM.java:50).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def run_oracle(frames, particles: int, seed: int = 0, map_size: float = 6.0):
    from gridmap_slam_tpu.oracle.numpy_ref import OracleGridMap, OracleSLAM
    t0 = time.time()
    gm = OracleGridMap(width_m=map_size, height_m=map_size,
                       origin=(-map_size / 2, -map_size / 2))
    o = OracleSLAM(num_particles=particles, gm=gm, seed=seed)
    traj = []
    for f in frames:
        o.update(f.angle, f.dist, f.hit, f.d_center, f.d_theta)
        traj.append(o.weighted_pose())
    return np.asarray(traj), time.time() - t0


def run_engine(frames, particles: int, max_beams: int, chunk: int = 0,
               map_size: float = 6.0):
    import jax
    from gridmap_slam_tpu import RBPF, SlamConfig
    from gridmap_slam_tpu.config import MapConfig
    from gridmap_slam_tpu.io import frame_at, frames_to_device
    cfg = SlamConfig(num_particles=particles, max_beams=max_beams,
                     particle_chunk=chunk,
                     map=MapConfig(width_m=map_size, height_m=map_size,
                                   resolution=0.05,
                                   origin=(-map_size / 2, -map_size / 2)))
    eng = RBPF(cfg)
    state = eng.init(jax.random.key(0))
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    step = eng.step_jit(donate=False)
    t0 = time.time()
    traj = []
    for i in range(len(frames)):
        state, info = step(state, frame_at(batch, i))
        traj.append(np.asarray(info.weighted_pose))
    return np.stack(traj), time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--revs", type=int, default=12)
    ap.add_argument("--beams", type=int, default=90)
    ap.add_argument("--particles", type=int, default=12,
                    help="engine particle count")
    ap.add_argument("--oracle-particles", type=int, default=None,
                    help="oracle particle count (default: same as engine)")
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--map-size", type=float, default=6.0,
                    help="map extent in m (two_rooms spans 10 m: use >=14)")
    ap.add_argument("--dataset", default=None,
                    help="reference-format .rec to replay (with a matching "
                         "*_gt.npy ground truth next to it)")
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.dataset:
        from gridmap_slam_tpu.io import read_recording
        frames = read_recording(args.dataset)
        gt = np.load(str(Path(args.dataset).with_suffix("")) + "_gt.npy")
        name = Path(args.dataset).name
    else:
        from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                                   simulate_log,
                                                   square_path_controls)
        frames, gt = simulate_log(default_world(),
                                  square_path_controls(args.revs),
                                  params=SimParams(beams_per_rev=args.beams),
                                  seed=args.seed)
        name = f"synthetic(revs={args.revs})"

    # --oracle-particles 0 skips the oracle entirely (engine-vs-ground-
    # truth only: the oracle costs ~0.25 s/particle/scan, i.e. HOURS on
    # long logs — 500p x 216 scans is a 7.5 h run)
    o_particles = (args.particles if args.oracle_particles is None
                   else args.oracle_particles)
    if o_particles > 0:
        o_traj, o_time = run_oracle(frames, o_particles,
                                    map_size=args.map_size)
    max_beams = max(96, max(len(f.angle) for f in frames))
    e_traj, e_time = run_engine(frames, args.particles, max_beams,
                                args.chunk, map_size=args.map_size)

    from gridmap_slam_tpu.utils.metrics import ate_rmse
    result = {
        "dataset": name, "scans": len(frames),
        "map_size_m": args.map_size,
        "engine_particles": args.particles,
        "oracle_particles": o_particles,
        "oracle_ate_m": (round(ate_rmse(o_traj, gt), 4)
                         if o_particles > 0 else None),
        "engine_ate_m": round(ate_rmse(e_traj, gt), 4),
        "oracle_wall_s": round(o_time, 1) if o_particles > 0 else None,
        "engine_wall_s": round(e_time, 1),
        "engine_beats_oracle": (bool(ate_rmse(e_traj, gt)
                                     <= ate_rmse(o_traj, gt) + 0.05)
                                if o_particles > 0 else None),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
