#!/bin/bash
# Sequential TPU benchmark ladder (VERDICT r1 items #1, #2, #4).
#
# One stage at a time, one process at a time, NO mid-compile kills: the
# tunneled dev chip takes minutes to remote-compile each new XLA program
# (cached persistently in $JAX_COMPILATION_CACHE_DIR afterwards), and killing
# a process mid-compile can wedge the chip for hours.  Each stage gets a
# generous timeout and its own log under docs/bench/.
#
# Dispatch sizing: the dev chip faults when one dispatch moves too much
# resample-gather volume (docs/TPU_FAULT.md), so every rung above 500
# particles replays in 4-frame segments (--seg-frames 4).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache_tpu}
mkdir -p docs/bench

run_stage() {
  local name="$1"; shift
  local log="docs/bench/${name}.log"
  echo "=== stage ${name} start $(date +%T) ===" | tee -a "$log"
  timeout "${STAGE_TIMEOUT:-5400}" "$@" >> "$log" 2>&1
  local rc=$?
  echo "=== stage ${name} rc=${rc} end $(date +%T) ===" | tee -a "$log"
  return $rc
}

# RBPF per-particle-map ladder (reference-parity -> toward BASELINE
# config 2; particles x seg_frames <= 6000 per docs/TPU_FAULT.md — 10k
# per-particle-map exceeds the dev chip's per-dispatch budget even at one
# step per dispatch and is documented as unreachable there).
run_stage rbpf500   python bench.py --particles 500   --chunk 250 --seg-frames 8 --skip-oracle
run_stage rbpf2000  python bench.py --particles 2000  --chunk 250 --seg-frames 2 --skip-oracle
run_stage rbpf4000  python bench.py --particles 4000  --chunk 250 --seg-frames 1 --skip-oracle

# Pallas kernels on hardware: tile-aligned 6.4 m map (128x128)
GRIDMAP_PALLAS=1 run_stage pallas500 python bench.py --particles 500 --chunk 250 \
    --map-size 6.4 --skip-oracle

# Shared-map scalable mode (BASELINE config 3 direction)
run_stage shared100k python bench.py --particles 100000 --chunk 1000 \
    --shared-map --seg-frames 4 --skip-oracle
run_stage shared1m  python bench.py --particles 1000000 --chunk 1000 \
    --shared-map --seg-frames 4 --skip-oracle

# City-scale: 200x200 m @ 5 cm (4000x4000 cells) shared map, 1M particles
run_stage city1m    python bench.py --particles 1000000 --chunk 1000 \
    --shared-map --map-size 200.0 --seg-frames 4 --skip-oracle

echo "LADDER DONE $(date +%T)"
