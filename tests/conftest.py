"""Test config: run on a simulated 8-device CPU mesh (SURVEY.md section 4).

Must set platform/flags before jax initializes.

Set ``NEOJAX_TPU_TESTS=1`` to keep the real accelerator instead (for the
device-gated suite, ``tests/test_tpu_device.py``); the CPU-mesh distributed
tests are not expected to pass in that mode — run the gated file alone.
"""

import os

_ON_DEVICE = bool(os.environ.get("NEOJAX_TPU_TESTS"))

if not _ON_DEVICE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The container's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already captured; override through the config API
# (effective as long as no backend has been initialized yet).
import jax

if not _ON_DEVICE:
    jax.config.update("jax_platforms", "cpu")
    # The reference has a full float64 path with a 1e-9 parity bound; enable
    # x64 so tests can exercise it (f32 stays f32 where explicitly
    # requested).  TPUs have no native f64, so device mode keeps x32.
    jax.config.update("jax_enable_x64", True)
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


def noise_signal(rng, *shape, dtype=np.float32):
    """Seeded uniform +-1 noise (reference ``generate_noise_signal``,
    ``src/neo/testing/testing.hpp:37-72``)."""
    return rng.uniform(-1.0, 1.0, size=shape).astype(dtype)


@pytest.fixture
def make_noise(rng):
    def _make(*shape, dtype=np.float32):
        return noise_signal(rng, *shape, dtype=dtype)

    return _make
