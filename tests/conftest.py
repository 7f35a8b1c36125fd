"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic can be
exercised without TPU hardware (the driver separately dry-runs the multichip
path).  These env vars must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
