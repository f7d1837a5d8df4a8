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
# serialize CPU dispatch: long xdist workers accumulate hundreds of live
# executables, and async dispatch overlapping XLA *compilation* of the next
# test's program intermittently segfaulted workers inside
# backend_compile_and_load (observed 2026-08-21, 2-3 crashes across three
# full runs, always mid-compile, never reproducible standalone).  Tests
# measure correctness, not dispatch latency — determinism wins here.
jax.config.update("jax_cpu_enable_async_dispatch", False)

import pytest  # noqa: E402

_TEST_COUNT = 0


@pytest.fixture(autouse=True)
def _bound_live_executables():
    """Clear jax's executable caches every 30 tests: the segfaults above
    struck only deep into a worker's life (hundreds of live compiled
    programs), never in short runs of the same tests — bounding the live
    set removes the trigger at the cost of some same-shape recompiles."""
    global _TEST_COUNT
    yield
    _TEST_COUNT += 1
    if _TEST_COUNT % 30 == 0:
        jax.clear_caches()
