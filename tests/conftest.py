"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4 prescription).

This box registers an 'axon' TPU PJRT plugin in every interpreter via
sitecustomize and pins jax_platforms to it, so plain env vars are not enough:
we override the config in-process before any backend is initialized.  The one
real TPU chip is exclusive to bench.py — tests must never touch it (two
processes contending for the chip deadlock in the device lock).
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA CPU compiles are expensive on this
# 2-core box; cache them across test runs.
_cache = os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/jaxcache")
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
