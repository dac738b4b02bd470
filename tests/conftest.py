"""Test harness: CPU backend with 8 virtual devices, float64 enabled.

Multi-device sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count``), per SURVEY §4's recommended
strategy — no TPU slice needed for collective correctness tests.
"""

import os

# must happen before jax import
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# the axon TPU plugin overrides JAX_PLATFORMS; force the CPU backend so the
# virtual 8-device mesh is available and runs are deterministic
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_MESH_DIR = "/root/reference/mesh"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (full solves / large meshes)"
    )


@pytest.fixture(scope="session")
def ref_mesh_dir():
    if not os.path.isdir(REFERENCE_MESH_DIR):
        pytest.skip("reference mesh directory unavailable")
    return REFERENCE_MESH_DIR


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
