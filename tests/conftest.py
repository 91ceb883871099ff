"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

All unit tests run on CPU so sharding paths can be exercised without
multi-chip hardware; the benchmark (bench.py) runs on the real TPU.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_SRC = "/root/reference/src"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_SRC)
