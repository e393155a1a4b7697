"""Test harness: force an 8-device virtual CPU platform BEFORE jax is imported,
so multi-chip sharding tests run on any host (the standard JAX stand-in for a
TPU slice)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The host environment presets JAX_PLATFORMS=axon (real TPU) and the axon
# plugin ignores the env var; force the virtual CPU mesh via jax.config.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    import jax

    return jax.random.PRNGKey(0)
