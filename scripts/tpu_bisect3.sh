#!/bin/bash
# Bisect round 3: single step@1000p works; lax.scan replay@750+ faults.
# Isolate donation vs resample-in-scan vs scan length.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache_tpu}
mkdir -p docs/bench

stage() {
  local name="$1"; shift
  local log="docs/bench/bisect_${name}.log"
  echo "=== ${name} start $(date +%T) ===" | tee -a "$log"
  timeout 2400 "$@" >> "$log" 2>&1
  echo "=== ${name} rc=$? end $(date +%T) ===" | tee -a "$log"
}

stage replay1000      python scripts/tpu_probe.py replay            --particles 1000 --chunk 250
stage nodonate1000    python scripts/tpu_probe.py replay_nodonate   --particles 1000 --chunk 250
stage noresample1000  python scripts/tpu_probe.py replay_noresample --particles 1000 --chunk 250
stage replay1000f2    python scripts/tpu_probe.py replay            --particles 1000 --chunk 250 --frames 2
stage steploop1000    python scripts/tpu_probe.py steploop          --particles 1000 --chunk 250 --frames 12
echo "BISECT3 DONE $(date +%T)"
