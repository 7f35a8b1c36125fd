"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic can be
exercised without TPU hardware (the driver separately dry-runs the multichip
path).  These env vars must be set before jax is imported anywhere.
"""

import os

# Force CPU even when a TPU platform plugin is preloaded via the
# environment (JAX_PLATFORMS may already be set to a hardware backend,
# so setdefault is not enough).  Disabling the pool-IP variable also keeps
# the plugin from claiming the real chip during unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache makes repeated test runs much faster
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# A sitecustomize may have imported jax already (hardware platform plugin),
# in which case the env var above was captured too late — override the
# config directly; backends are initialized lazily so this still wins as
# long as no jax computation ran yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on CPU (8 virtual devices), got "
    f"{jax.default_backend()}")
