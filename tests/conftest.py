"""Test configuration: force CPU with 8 virtual devices.

Numerics tests run on CPU for speed/determinism; sharding tests use the
8-device virtual CPU mesh (the standard way to test pjit/shard_map without
a pod). This must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize imports jax with JAX_PLATFORMS=axon before conftest runs,
# so the env var alone is too late — update the live config as well
# (backends are not initialized yet at conftest-import time).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
