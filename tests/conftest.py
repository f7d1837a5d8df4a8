"""Test configuration: force the CPU backend (8 virtual devices for
multi-chip sharding tests) and enable float64 so closed-form oracle
comparisons are meaningful.  The axon sitecustomize pins JAX_PLATFORMS=axon,
so the platform must be overridden through jax.config before first use."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
