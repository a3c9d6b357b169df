"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver benches on one real TPU chip; tests must be runnable anywhere,
so we force the CPU platform with 8 virtual devices to exercise sharding
paths (multi-chip semantics without multi-chip hardware).

NOTE: this environment presets JAX_PLATFORMS=axon (the TPU plugin) and the
plugin wins over a later env-var change, so we must force the platform via
jax.config, not os.environ.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
