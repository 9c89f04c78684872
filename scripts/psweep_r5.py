"""Does particle count MATTER?  The ambiguity P-sweep (round-4 VERDICT #2).

The headline metric is scans/s/chip at 1M particles, but round 4 never
showed a task where 1M particles beat 10k: the reloc demo's world was
discriminative enough that it converged at scan 0.  This study builds a
world where small filters FAIL:

- six IDENTICAL 6 m rooms in a row (multi_room_world(6, 1)): a robot
  inside an interior room sees (near-)identical scans in rooms 2-5, and
  each room is also ~180-degree rotationally self-similar — the posterior
  must stay multi-modal (up to ~8 modes) for many scans;
- the robot is KIDNAPPED at t=0 (uniform init over the full 38 x 9.2 m
  map x full circle, frozen known map) inside room 3, then drives east
  through the door line; the ambiguity only resolves when the east END
  room's outer wall comes into view;
- success requires a particle near the TRUE mode to SURVIVE every
  resampling of the ambiguous phase.  Uniform init puts ~P * 3e-6
  particles into any one (0.5 m, 30 deg) basin, and each resample prunes
  modes — the failure probability rises steeply as P falls.

Sweep P in {10k, 100k, 1M} x seeds; report per-scan best/mean error,
Neff, per-room particle mass (the multimodality evidence), and
scans-to-converge.  Writes docs/bench/psweep_r5.json.

Usage:  python scripts/psweep_r5.py                 # TPU, full sweep
        python scripts/psweep_r5.py --smoke         # CPU-sized
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

ROOM = 6.0
ROOMS = 6


def build_world():
    """Six identical rooms in a row PLUS one asymmetric landmark in the
    east end room.  Without it the row is globally 180-degree symmetric
    (the west-driving twin of the true trajectory sees IDENTICAL scans
    forever), so convergence to the true mode was a coin flip — measured
    in the first sweep: failures all landed exactly at the rotated twin,
    31.4 m away.  The landmark is deep in room 6, so it only becomes
    visible near the end of the run: the translational + rotational
    ambiguity persists through most of the log by design, and success
    hinges on the TRUE mode's particles surviving every resampling of
    the ambiguous phase — the P-dependent event this benchmark sweeps."""
    import numpy as np
    from gridmap_slam_tpu.io.synthetic import box, multi_room_world
    world = multi_room_world(ROOMS, 1, room=ROOM)
    x0 = -ROOMS * ROOM / 2
    # a 1 x 0.6 m block in room 6's north half (room 6 spans x in
    # [x0+30, x0+36])
    return np.concatenate([
        world, np.asarray(box(x0 + 32.4, 1.6, x0 + 33.4, 2.2))])


def build_map_log(params, seed=0):
    """Coverage pass for the known map: drive the whole row west->east
    along the door line, scanning every room."""
    from gridmap_slam_tpu.io.synthetic import simulate_log
    world = build_world()
    n = 46
    controls = [(0.4, 0.0)] * n
    return simulate_log(world, controls, params=params, seed=seed,
                        start_pose=(-ROOMS * ROOM / 2 + 1.0, 0.0, 0.0))


def build_test_log(params, seed):
    """The kidnapped run: wake up mid-room-3, sit one rev, then drive east
    to the end room."""
    from gridmap_slam_tpu.io.synthetic import simulate_log
    world = build_world()
    controls = [(0.0, 0.0)] * 2 + [(0.4, 0.0)] * 26
    # room 3 spans x in [-6, 0]; start at its center on the door line
    return simulate_log(world, controls, params=params, seed=seed,
                        start_pose=(-3.0, 0.0, 0.0))


def room_masses(poses_x):
    x0 = -ROOMS * ROOM / 2
    edges = x0 + ROOM * np.arange(ROOMS + 1)
    hist, _ = np.histogram(poses_x, bins=edges)
    return (hist / max(len(poses_x), 1)).round(4).tolist()


def run_one(cfg_base, lo, frames, gt, particles, seed, nt, temp):
    import jax
    import jax.numpy as jnp
    from gridmap_slam_tpu.io import frame_at, frames_to_device
    from gridmap_slam_tpu.models.shared import SharedMapSLAM
    from gridmap_slam_tpu.ops.geometry import wrap_angle

    cfg = cfg_base.replace(num_particles=particles).with_overrides({
        "matcher.surface_nt": nt,
        "matcher.surface_theta_span_deg": 180.0,
        "matcher.surface_crop_cells": 0,
        "matcher.surface_corr": "fft",
        # Relocalization field/search settings (the round-5 finding this
        # sweep produced, see config.MapConfig.likelihood_sigma_cells):
        # a WIDER field (0.2 m) makes surface scores tolerant of the
        # theta-bin granularity (endpoint displacement range*dtheta/2 at
        # nt=48 is ~0.2 m at typical ranges) and refine steps walk every
        # particle to its mode's local optimum so mode mass flows by
        # mode identity, not bin-alignment luck.
        "map.likelihood_sigma_cells": 4.0,
        "matcher.surface_refine_steps": 3,
        "matcher.surface_weight_temp": temp,
    })
    eng = SharedMapSLAM(cfg)
    state = eng.init_uniform(jax.random.key(seed * 1000 + 17), jnp.asarray(lo))
    step = jax.jit(eng.step_surface, donate_argnums=(0,))
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)

    rows = []
    t0 = time.perf_counter()
    for i in range(len(frames)):
        state, info = step(state, frame_at(batch, i))
        g = gt[i]
        best = np.asarray(info.best_pose)
        wmean = np.asarray(info.weighted_pose)
        import jax.numpy as _jnp
        rows.append({
            "scan": i,
            "neff_frac": round(float(info.neff) / particles, 6),
            "err_best_m": round(float(np.hypot(best[0] - g[0],
                                               best[1] - g[1])), 3),
            "err_mean_m": round(float(np.hypot(wmean[0] - g[0],
                                               wmean[1] - g[1])), 3),
            "err_best_theta": round(float(abs(wrap_angle(
                _jnp.asarray(best[2] - g[2])))), 3),
            "room_mass": room_masses(np.asarray(state.poses[:, 0])),
            "resampled": bool(info.resampled),
        })
    wall = time.perf_counter() - t0

    thresh = 0.3
    conv = None
    for i in range(len(rows)):
        if all(r["err_best_m"] < thresh and r["err_best_theta"] < 0.2
               for r in rows[i:]):
            conv = i
            break
    n_modes_early = sum(1 for m in rows[min(3, len(rows) - 1)]["room_mass"]
                        if m > 0.05)
    return {
        "particles": particles, "seed": seed,
        "surface_weight_temp": temp, "theta_bins": nt,
        "n_scans": len(frames),
        "success": bool(rows[-1]["err_best_m"] < thresh
                        and rows[-1]["err_best_theta"] < 0.2),
        "converged_at_scan": conv,
        "final_err_best_m": rows[-1]["err_best_m"],
        "final_err_mean_m": rows[-1]["err_mean_m"],
        "rooms_with_mass_scan3": n_modes_early,
        "wall_s": round(wall, 1),
        "per_scan": rows,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--nt", type=int, default=48)
    ap.add_argument("--temp", type=float, default=None,
                    help="surface_weight_temp (default: config default)")
    ap.add_argument("--pset", default=None,
                    help="comma-separated particle counts")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--out", default="docs/bench/psweep_r5.json")
    args = ap.parse_args()

    from gridmap_slam_tpu import SlamConfig
    from gridmap_slam_tpu.config import MapConfig
    from gridmap_slam_tpu.io.synthetic import SimParams
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from reloc_demo import build_gt_map  # noqa: E402

    params = SimParams(beams_per_rev=180)
    w = ROOMS * ROOM + 2.0
    h = 9.2
    cfg_base = SlamConfig(
        num_particles=1000, max_beams=192, freeze_map=True,
        map=MapConfig(width_m=w, height_m=h, resolution=0.05,
                      origin=(-w / 2, -h / 2)))
    if args.temp is not None:
        cfg_base = cfg_base.with_overrides(
            {"matcher.surface_weight_temp": args.temp})
    temp = cfg_base.matcher.surface_weight_temp

    map_frames, map_gt = build_map_log(params)
    lo = np.asarray(build_gt_map(map_frames, map_gt, cfg_base))
    print(f"map {lo.shape}, occupied {int((lo > 1.0).sum())}",
          file=sys.stderr, flush=True)

    pset = ([2_000, 20_000] if args.smoke else [10_000, 100_000, 1_000_000])
    if args.pset:
        pset = [int(x) for x in args.pset.split(",")]
    nt = 8 if args.smoke else args.nt
    seeds = range(args.seeds)

    runs = []
    for particles in pset:
        for seed in seeds:
            frames, gt = build_test_log(params, seed=100 + seed)
            r = run_one(cfg_base, lo, frames, gt, particles, seed, nt, temp)
            runs.append(r)
            print(json.dumps({k: v for k, v in r.items()
                              if k != "per_scan"}), flush=True)

    by_p = {}
    for r in runs:
        by_p.setdefault(r["particles"], []).append(r)
    summary = [{
        "particles": p,
        "success_rate": round(np.mean([r["success"] for r in rs]), 3),
        "mean_converged_at": (None if not any(
            r["converged_at_scan"] is not None for r in rs)
            else round(float(np.mean([r["converged_at_scan"] for r in rs
                                      if r["converged_at_scan"] is not None
                                      ])), 1)),
        "runs": len(rs),
    } for p, rs in sorted(by_p.items())]

    out = {
        "what": ("kidnapped-robot P-sweep in a 6-identical-room world "
                 "(multi-modal posterior; frozen known map; uniform init "
                 "over 38x9.2 m x full circle; success = best particle "
                 "within 0.3 m / 0.2 rad at the end and stably from "
                 "convergence on)"),
        "world": f"multi_room_world({ROOMS},1,room={ROOM}) — rooms 2-5 "
                 "are translationally identical + ~180deg self-similar",
        "summary": summary,
        "runs": runs,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(summary))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
