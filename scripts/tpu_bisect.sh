#!/bin/bash
# Bisect the >500-particle RBPF device fault (VERDICT r1 #1).
# Variants isolate: determinism, particle threshold, donation, resampling,
# replay-scan vs single-step.  One at a time; generous timeouts; logs under
# docs/bench/bisect_*.log.
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

# 0. chip healthy? (cached program, fast)
stage health python bench.py --particles 500 --chunk 250 --skip-oracle
# 1. deterministic? rerun the exact failing program (cached)
stage repro2000 python bench.py --particles 2000 --chunk 250 --skip-oracle
# 2. threshold: 1000p
stage rbpf1000 python bench.py --particles 1000 --chunk 250 --skip-oracle
# 3-6. feature isolation at 2000p
stage step2000 python scripts/tpu_probe.py step --particles 2000 --chunk 250
stage nodonate2000 python scripts/tpu_probe.py replay_nodonate --particles 2000 --chunk 250
stage noresample2000 python scripts/tpu_probe.py replay_noresample --particles 2000 --chunk 250
stage resample2000 python scripts/tpu_probe.py resample --particles 2000
echo "BISECT DONE $(date +%T)"
