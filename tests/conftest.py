"""Test harness config: force a virtual 8-device CPU mesh.

Tests never touch the real TPU (bench.py does); multi-device sharding tests
run on the simulated host-platform mesh per SURVEY.md §5.

The environment's sitecustomize registers the axon TPU backend and imports
jax at interpreter startup, so JAX_PLATFORMS in os.environ is already baked
into jax.config before this file runs. Backend *clients* are created lazily
though, so flipping the config (and XLA_FLAGS, read at client creation)
here still takes effect — as long as no test imports jax before conftest,
which pytest guarantees.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (~15 min);
# repeat runs hit disk instead of recompiling every jitted program.
from nemar_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
