"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere, and enable x64 so accuracy oracles can be
checked at reference tolerances (tests/correctness.cpp uses 1e-13)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
