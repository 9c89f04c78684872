#!/bin/bash
# Escalating TPU benchmark ladder. Runs each size in its own process with a
# generous timeout, health-checks the chip between sizes, and stops
# escalating on the first failure (a faulted kernel wedges the tunneled dev
# chip for hours — never retry upward after a failure).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/bench_ladder}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache_tpu}

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x=(jnp.ones((8,8))*2).sum(); print('probe ok', float(x))" 2>/dev/null | grep -q "probe ok"
}

run_one() {
  local label=$1; shift
  echo "=== $label: $* ==="
  if ! probe; then echo "$label: TPU unhealthy, stopping"; return 1; fi
  if timeout 900 python bench.py "$@" >"$OUT/$label.json" 2>"$OUT/$label.err"; then
    echo "$label: $(cat "$OUT/$label.json")"
    return 0
  else
    echo "$label: FAILED (see $OUT/$label.err)"
    return 1
  fi
}

run_one parity  --preset parity --frames 10 --skip-oracle || exit 1
run_one pr1     --preset pr1 --frames 10 --skip-oracle    || exit 1
run_one p2000   --particles 2000 --chunk 250 --frames 10 --skip-oracle || exit 1
run_one p4000   --particles 4000 --chunk 250 --frames 10 --skip-oracle || exit 1
run_one p6000   --particles 6000 --chunk 250 --frames 8 --skip-oracle  || exit 1
run_one p8000   --particles 8000 --chunk 250 --frames 8 --skip-oracle  || exit 1
run_one chip    --preset chip --frames 8 --skip-oracle    || exit 1
run_one mega    --preset mega --frames 6 --skip-oracle    || exit 1
echo "ladder complete"
