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
# Persistent compilation cache: the suite re-compiles the same fused train
# step / backbone graphs every run (tens of minutes of XLA:CPU compiles);
# cache hits cut reruns to seconds. Override with JAX_COMPILATION_CACHE_DIR.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gdt_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.devices()[0].platform == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(23)


@pytest.fixture
def key():
    return jax.random.PRNGKey(23)
