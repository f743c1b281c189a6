"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests must be runnable without TPU hardware; multi-chip sharding tests use
the 8 virtual CPU devices. This must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
