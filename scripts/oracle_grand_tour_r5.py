"""Round-5 refresh of the grand_tour_216 oracle row (VERDICT r4 #9).

Runs ONLY the NumPy oracle (no engine, no TPU) at >=100 particles on the
flagship 216-scan log and merges the result into the existing parity
artifact, keeping the engine row that was measured on silicon.  The oracle
costs ~0.03 s/particle/scan on this host => ~100p x 216 scans ~= 2 h, which
is why this runs as a detached background job while round-5 work proceeds.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

PARTICLES = 100
MAP_SIZE = 14.0
DATASET = "maps/grand_tour_216.rec"
OUT = "docs/ate_parity_grand_tour_216.json"


def main():
    from gridmap_slam_tpu.io import read_recording
    from gridmap_slam_tpu.oracle.numpy_ref import OracleGridMap, OracleSLAM
    from gridmap_slam_tpu.utils.metrics import ate_rmse

    frames = read_recording(DATASET)
    gt = np.load(str(Path(DATASET).with_suffix("")) + "_gt.npy")

    t0 = time.time()
    gm = OracleGridMap(width_m=MAP_SIZE, height_m=MAP_SIZE,
                       origin=(-MAP_SIZE / 2, -MAP_SIZE / 2))
    o = OracleSLAM(num_particles=PARTICLES, gm=gm, seed=0)
    traj = []
    for i, f in enumerate(frames):
        o.update(f.angle, f.dist, f.hit, f.d_center, f.d_theta)
        traj.append(o.weighted_pose())
        if i % 10 == 0:
            print(f"scan {i}/{len(frames)} t={time.time() - t0:.0f}s",
                  flush=True)
    o_time = time.time() - t0
    o_ate = float(ate_rmse(np.asarray(traj), gt))

    prev = json.loads(Path(OUT).read_text())
    prev.update({
        "oracle_particles": PARTICLES,
        "oracle_ate_m": round(o_ate, 4),
        "oracle_wall_s": round(o_time, 1),
        "engine_beats_oracle": bool(prev["engine_ate_m"] <= o_ate + 0.05),
        "note": ("round-5 oracle refresh at 100 particles (VERDICT r4 #9); "
                 "engine row unchanged from the round-4 silicon run"),
    })
    Path(OUT).write_text(json.dumps(prev, indent=2))
    print(json.dumps(prev, indent=2))


if __name__ == "__main__":
    main()
