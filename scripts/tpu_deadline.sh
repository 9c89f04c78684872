#!/bin/bash
# Post-ladder probes: (a) is the per-dispatch fault an execution DEADLINE
# (content-independent) or a workload-specific budget? (b) honest fence-timed
# rbpf500 + corrected-seg rungs + fixed Pallas rung.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache_tpu}
mkdir -p docs/bench

stage() {
  local name="$1"; shift
  local log="docs/bench/${name}.log"
  echo "=== ${name} start $(date +%T) ===" | tee -a "$log"
  timeout 2400 "$@" >> "$log" 2>&1
  echo "=== ${name} rc=$? end $(date +%T) ===" | tee -a "$log"
}

# RNG-budget hypothesis: same P x F as the faulting replay, RNG only
stage rng1000f12 python scripts/tpu_probe.py rngonly --particles 1000 --frames 12
stage rng500f12  python scripts/tpu_probe.py rngonly --particles 500  --frames 12

# deadline flavor 0: HBM-traffic loops (0.5 GB/iter)
stage dl_t40   python scripts/tpu_probe.py deadline --chunk 40  --beams 0
stage dl_t160  python scripts/tpu_probe.py deadline --chunk 160 --beams 0
stage dl_t640  python scripts/tpu_probe.py deadline --chunk 640 --beams 0
# deadline flavor 1: matmul loops (compute-bound)
stage dl_m160  python scripts/tpu_probe.py deadline --chunk 160 --beams 1

# honest (fence-timed) numbers with budget-correct segments
stage rbpf500v2  python bench.py --particles 500  --chunk 250 --seg-frames 8 --skip-oracle
stage rbpf2000v2 python bench.py --particles 2000 --chunk 250 --seg-frames 2 --skip-oracle
stage rbpf4000v2 python bench.py --particles 4000 --chunk 250 --seg-frames 1 --skip-oracle
GRIDMAP_PALLAS=1 stage pallas500v2 python bench.py --particles 500 --chunk 250 \
    --seg-frames 8 --map-size 6.4 --skip-oracle
echo "DEADLINE+V2 DONE $(date +%T)"
