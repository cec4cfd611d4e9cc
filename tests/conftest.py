import os

# Force a deterministic 8-device CPU mesh for all tests. The axon
# sitecustomize pins jax_platforms to the TPU backend regardless of the
# JAX_PLATFORMS env var, so override via jax.config after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
EXAMPLE_DIR = pathlib.Path("/root/reference/example")


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


@pytest.fixture(scope="session")
def example_dir():
    if not EXAMPLE_DIR.exists():
        pytest.skip("reference example dir unavailable")
    return EXAMPLE_DIR
