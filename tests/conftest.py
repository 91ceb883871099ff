"""Test configuration: force an 8-device virtual CPU mesh.

All unit tests run on CPU so sharding paths can be exercised without
multi-chip hardware; the benchmark (bench.py) runs on the real TPU.

Note: the harness environment pre-imports JAX at interpreter startup with
JAX_PLATFORMS=axon (the tunneled TPU), so env vars set here are too late —
we switch platforms through jax.config, which works until a backend is
actually instantiated.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache shared across the chunked runner's processes
# (scripts/run_tests.py) and across runs: repeat suite walls are then
# execution-dominated instead of XLA:CPU compile-dominated.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuir_jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_SRC = "/root/reference/src"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_SRC)
