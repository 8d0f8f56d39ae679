"""Test harness configuration.

Tests run on CPU with a simulated 8-device mesh (the standard JAX trick for
exercising multi-chip sharding logic without a pod slice — SURVEY.md §4.4)
and with x64 enabled so the f64 golden path is available as the parity
oracle. A persistent compilation cache keeps repeated test runs fast.
"""

import os

# Force CPU: the environment defaults JAX_PLATFORMS to the single real TPU
# (one relay session per process — concurrent test processes would contend
# for it). Tests exercise TPU *logic* on the host backend.
#
# NOTE: the env var alone is NOT enough here — a sitecustomize module
# imports jax at interpreter startup, latching JAX_PLATFORMS before this
# conftest runs. jax.config.update("jax_platforms", ...) overrides the
# latched value as long as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/trt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

SCENE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "scenes")
SCENE_NAMES = [
    "quadratic", "20spheres", "reflection_test", "dingdong",
    "cayley", "clebsch", "cubic", "monkey_saddle",
]


@pytest.fixture(scope="session")
def scene_dir():
    return SCENE_DIR


def scene_path(name: str) -> str:
    return os.path.join(SCENE_DIR, name + ".yml")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260817)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (multi-process etc.)"
    )
