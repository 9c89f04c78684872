"""ATE parity: this engine vs the reference math (NumPy oracle) on one log.

BASELINE.json acceptance: "trajectories match the reference implementation
within its ATE bound on replayed logs".  The oracle (oracle/numpy_ref.py)
reimplements the reference's per-particle pipeline faithfully (DDA
integration, blur likelihood field, brute-force matcher, per-scan weights);
both consume the identical recording and are scored against simulator ground
truth.  The engine matches parity when its ATE <= oracle ATE + margin.

Usage:  python scripts/ate_parity.py [--revs 12] [--particles 12] [--out f]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--revs", type=int, default=12)
    ap.add_argument("--beams", type=int, default=90)
    ap.add_argument("--particles", type=int, default=12)
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log,
                                               square_path_controls)
    frames, gt = simulate_log(default_world(),
                              square_path_controls(args.revs),
                              params=SimParams(beams_per_rev=args.beams),
                              seed=args.seed)

    # ---- oracle (reference math) ----
    from gridmap_slam_tpu.oracle.numpy_ref import OracleSLAM
    t0 = time.time()
    o = OracleSLAM(num_particles=args.particles, seed=0)
    o_traj = []
    for f in frames:
        o.update(f.angle, f.dist, f.hit, f.d_center, f.d_theta)
        o_traj.append(o.weighted_pose())
    o_traj = np.asarray(o_traj)
    o_time = time.time() - t0

    # ---- this engine ----
    import jax
    from gridmap_slam_tpu import RBPF, SlamConfig
    from gridmap_slam_tpu.io import frames_to_device, frame_at
    cfg = SlamConfig(num_particles=args.particles,
                     max_beams=max(96, args.beams))
    eng = RBPF(cfg)
    state = eng.init(jax.random.key(0))
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    step = jax.jit(eng.step)
    t0 = time.time()
    e_traj = []
    for i in range(len(frames)):
        state, info = step(state, frame_at(batch, i))
        e_traj.append(np.asarray(info.weighted_pose))
    e_traj = np.stack(e_traj)
    e_time = time.time() - t0

    from gridmap_slam_tpu.utils.metrics import ate_rmse
    result = {
        "revs": args.revs, "particles": args.particles,
        "oracle_ate_m": round(ate_rmse(o_traj, gt), 4),
        "engine_ate_m": round(ate_rmse(e_traj, gt), 4),
        "oracle_wall_s": round(o_time, 1),
        "engine_wall_s": round(e_time, 1),
        "engine_beats_oracle": bool(ate_rmse(e_traj, gt)
                                    <= ate_rmse(o_traj, gt) + 0.05),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
