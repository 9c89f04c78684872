#!/bin/bash
# Bisect round 2: separate chunk-count from particle-count dependence.
# 500p/250c (2 chunks) works; 1000p/250c (4 chunks) faults.
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

stage p500c125  python bench.py --particles 500  --chunk 125 --skip-oracle   # 4 chunks, 500p
stage p750c250  python bench.py --particles 750  --chunk 250 --skip-oracle   # 3 chunks
stage p1000c500 python bench.py --particles 1000 --chunk 500 --skip-oracle   # 2 chunks, 1000p
stage p1000c0   python bench.py --particles 1000 --chunk 0   --skip-oracle   # 1 chunk (full vmap)
# single full step (no lax.scan replay) at 1000p
stage step1000  python scripts/tpu_probe.py step --particles 1000 --chunk 250
# individual ops at 1000p
stage llf1000   python scripts/tpu_probe.py llfield   --particles 1000
stage match1000 python scripts/tpu_probe.py matcher   --particles 1000
stage integ1000 python scripts/tpu_probe.py integrate --particles 1000
stage rsmp1000  python scripts/tpu_probe.py resample  --particles 1000
echo "BISECT2 DONE $(date +%T)"
