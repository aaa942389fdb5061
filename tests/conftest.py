"""Test configuration.

Tests run on CPU with 8 virtual devices so the same ``jax.sharding.Mesh`` /
``pjit`` code paths exercised on a real TPU pod slice (ICI collectives) run
in CI without TPU hardware.

NOTE: this environment pre-imports jax (sitecustomize) with a TPU platform
already selected, so we must switch platforms via ``jax.config`` rather than
env vars; XLA_FLAGS is still honored because CPU backend init is lazy.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.devices()[0].platform == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(23)


@pytest.fixture
def key():
    return jax.random.PRNGKey(23)
