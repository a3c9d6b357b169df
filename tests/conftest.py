"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver benches on one real TPU chip; tests must be runnable anywhere, so
we force the CPU platform with 8 virtual devices to exercise the sharding
paths (multi-chip semantics without multi-chip hardware).

Must run before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
