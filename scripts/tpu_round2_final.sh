#!/bin/bash
# Final round-2 hardware pass: dispatch-jitter stats, gather-budget
# confirmation, marginal (RTT-cancelled) throughput ladder, Pallas rung.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache_tpu}
mkdir -p docs/bench

stage() {
  local name="$1"; shift
  local log="docs/bench/${name}.log"
  echo "=== ${name} start $(date +%T) ===" | tee -a "$log"
  timeout 3000 "$@" >> "$log" 2>&1
  echo "=== ${name} rc=$? end $(date +%T) ===" | tee -a "$log"
}

stage jitter    python scripts/tpu_probe.py jitter --frames 16
stage dlg40     python scripts/tpu_probe.py dlgather --chunk 40
stage dlg80     python scripts/tpu_probe.py dlgather --chunk 80

stage marg500   python bench.py --particles 500  --chunk 250 --frames 12 --marginal --skip-oracle
stage marg2000  python bench.py --particles 2000 --chunk 250 --frames 3  --marginal --skip-oracle
stage marg4000  python bench.py --particles 4000 --chunk 250 --frames 1  --marginal --skip-oracle
GRIDMAP_PALLAS=1 stage margpallas python bench.py --particles 500 --chunk 250 \
    --frames 12 --map-size 6.4 --marginal --skip-oracle
# shared-map marginal at the single-dispatch ceiling (~16k particles)
stage margsh16k python bench.py --particles 16000 --chunk 1000 --frames 1 \
    --shared-map --marginal --skip-oracle
echo "ROUND2 FINAL DONE $(date +%T)"
