"""Silicon number for the map-sharded surface engine at mesh (1, 1).

One chip cannot exercise the halo/all_gather wires (the 8-device virtual
CPU mesh does, tests/test_surface_sharded.py); what the (p=1, m=1) run
proves on silicon is that the sharded FORMULATION — tiled LL build, crop
assembly, bin-grouped correlation, tile-local crop integration — costs no
more than the plain step_surface it must replace at city scale.  Marginal
timing (dispatch RTT cancelled) on the city preset, vs step_surface on
the same workload.

Writes docs/bench/surface_sharded_r5.json.
"""

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gridmap_slam_tpu import SlamConfig
    from gridmap_slam_tpu.config import MapConfig
    from gridmap_slam_tpu.io import frames_to_device
    from gridmap_slam_tpu.io.synthetic import (SimParams, default_world,
                                               simulate_log,
                                               square_path_controls)
    from gridmap_slam_tpu.models.shared import SharedMapSLAM
    from gridmap_slam_tpu.parallel.mesh import make_mesh
    from gridmap_slam_tpu.parallel.surface_sharded import (
        init_surface_sharded, make_surface_sharded_step)

    particles = 1_000_000
    map_size = 200.0
    cfg = SlamConfig(
        num_particles=particles, max_beams=192,
        map=MapConfig(width_m=map_size, height_m=map_size, resolution=0.05,
                      origin=(-map_size / 2, -map_size / 2)),
    ).with_overrides({"matcher.surface_crop_cells": 512,
                      "matcher.surface_refine_steps": 0})
    frames, _ = simulate_log(default_world(), square_path_controls(4),
                             params=SimParams(beams_per_rev=180), seed=0)
    batch = frames_to_device(frames, cfg.max_beams, cfg.sensor.max_range)
    n = len(frames)
    k = 3
    bk = jax.tree.map(lambda a: jnp.concatenate([a] * k, axis=0), batch)

    eng = SharedMapSLAM(cfg)
    mesh = make_mesh(1, map_shards=1)
    raw = make_surface_sharded_step(eng, mesh, jit=False)
    replay = jax.jit(lambda s, b: jax.lax.scan(raw, s, b))

    def marginal(replay_fn, init_state):
        def timed(b, reps=6):
            ts = []
            for r in range(reps + 1):
                s0 = init_state(r)
                float(jnp.sum(s0.log_weights))
                t0 = time.perf_counter()
                s, _ = replay_fn(s0, b)
                float(jnp.sum(s.log_weights))
                if r > 0:
                    ts.append(time.perf_counter() - t0)
            return statistics.median(ts)
        t1 = timed(batch)
        tk = timed(bk)
        return max(tk - t1, 1e-9) / ((k - 1) * n)

    per_sharded = marginal(
        replay, lambda r: init_surface_sharded(eng, jax.random.key(r), mesh))
    # plain step_surface baseline at the identical workload
    eng2 = SharedMapSLAM(cfg)
    per_plain = marginal(eng2.replay_surface_jit(),
                         lambda r: eng2.init(jax.random.key(r)))

    result = {
        "what": ("map-sharded surface engine at mesh (1,1) vs plain "
                 "step_surface, city preset (1M particles, 200x200 m @ "
                 "5 cm, crop 512, nt 25, refine 0), marginal timing"),
        "sharded_ms_per_scan": round(1e3 * per_sharded, 2),
        "plain_ms_per_scan": round(1e3 * per_plain, 2),
        "overhead": round(per_sharded / per_plain, 3),
        "surface_weight_temp": cfg.matcher.surface_weight_temp,
        "resample_fraction": cfg.resample_fraction,
        "n_scans": n, "timing": "marginal_rtt_cancelled",
        "device": str(jax.devices()[0]),
    }
    out = Path("docs/bench/surface_sharded_r5.json")
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
