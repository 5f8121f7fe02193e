"""Test fixtures: force an 8-device virtual CPU platform.

All tests run on CPU with 8 virtual devices so sharding tests (SURVEY.md §4,
item 4) run without TPU hardware. Must happen before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by a sitecustomize TPU shim that snapshotted
# JAX_PLATFORMS before this file ran — force the platform via config too.
jax.config.update("jax_platforms", "cpu")

# float64 available in tests for high-precision oracles (framework default
# stays float32; tests that need f64 ask for it explicitly).
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(0)
