"""Test configuration.

The environment may preload jax with a TPU backend (JAX_PLATFORMS=axon
via sitecustomize); tests always run on CPU with 8 virtual devices so
multi-chip sharding tests work anywhere, and with x64 enabled so
accuracy oracles can be checked at reference tolerances
(tests/correctness.cpp uses 1e-13).  ``jax.config.update`` is used
because the env var was already captured at interpreter start.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
