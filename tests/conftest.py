"""Test configuration.

Tests run on CPU with 8 virtual devices (so multi-chip sharding paths are
exercised without TPU hardware) and with x64 enabled (the f64/c128 half of
the reference's four-dtype test matrix).

Note: the ambient environment registers the ``axon`` TPU-tunnel platform
and force-sets ``jax_platforms`` at import time, so overriding the
JAX_PLATFORMS env var alone is not enough — the config must be updated
after import, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The full suite compiles thousands of XLA:CPU programs in one
    process; with everything cached, the CPU backend segfaulted inside
    LLVM compilation around the ~360th test (deterministically, twice —
    the same modules pass in isolation). Dropping the executable caches
    per module keeps per-process JIT state bounded at a small
    recompilation cost for cross-module shared fixtures.
    """
    yield
    jax.clear_caches()
