"""Phase 2 of the temperature study: joint (surface_weight_temp,
resample_fraction) selection with seed replication.

Phase 1 (docs/bench/temp_study_r5.json) showed: tempering alone cannot
push Neff past the 0.5*P gate without ATE cost (temp 0.01 is the only
config that gates off resampling, at a mild ATE penalty), but MODERATE
temps lift mean Neff to 20-45 % of P — so a lower gate threshold
(resample_fraction) makes resampling occasional at temperatures that are
ATE-neutral.  This phase sweeps the pairs and replicates seeds; the
chosen default is recorded in config.py.

Writes docs/bench/temp_study2_r5.json.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from temp_study_r5 import run_case  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--out", default="docs/bench/temp_study2_r5.json")
    args = ap.parse_args()

    from gridmap_slam_tpu.io import read_recording
    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log,
                                               square_path_controls)

    pairs = [(1.0, 0.5), (0.1, 0.1), (0.075, 0.15), (0.05, 0.2),
             (0.03, 0.25), (0.01, 0.5)]
    mid_p = 2_000 if args.smoke else 100_000
    big_p = 20_000 if args.smoke else 1_000_000

    frames_c = read_recording("maps/room_loop_40.rec")
    gt_c = np.load("maps/room_loop_40_gt.npy")

    results = {"canonical_room_loop_40_seeds": [], "bench_synthetic_1M": []}
    # canonical ATE robustness: 3 seeds per pair (the pair enters jit as
    # static config; seeds vary the log)
    for temp, rf in pairs:
        for seed in (0, 1, 2):
            fr, gt = simulate_log(default_world(),
                                  square_path_controls(24),
                                  params=SimParams(beams_per_rev=180),
                                  seed=50 + seed)
            r = run_case(fr, gt, mid_p, temp, 6.0, 192,
                         resample_fraction=rf)
            r["seed"] = seed
            results["canonical_room_loop_40_seeds"].append(r)
            print(json.dumps(r), flush=True)
    # 1M throughput spot checks on the bench log
    frames_b, gt_b = simulate_log(default_world(), square_path_controls(12),
                                  params=SimParams(beams_per_rev=180),
                                  seed=0)
    for temp, rf in pairs:
        r = run_case(frames_b, gt_b, big_p, temp, 6.0, 192,
                     resample_fraction=rf)
        results["bench_synthetic_1M"].append(r)
        print(json.dumps(r), flush=True)

    # also the canonical recording itself at the winning-candidate pairs
    for temp, rf in [(1.0, 0.5), (0.05, 0.2), (0.03, 0.25)]:
        r = run_case(frames_c, gt_c, mid_p, temp, 6.0, 192,
                     resample_fraction=rf)
        r["dataset"] = "room_loop_40.rec"
        results.setdefault("canonical_recording", []).append(r)
        print(json.dumps(r), flush=True)

    out = {
        "what": ("joint (surface_weight_temp, resample_fraction) study; "
                 "phase 1 = temp_study_r5.json"),
        "results": results,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
