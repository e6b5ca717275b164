"""Test configuration: force CPU backend with a virtual 8-device mesh.

Tests must run anywhere (CI, dev box) without TPU hardware; sharding tests
use the 8 virtual CPU devices. `bench.py` is what runs on the real chip.
"""

import os

# Must be set before jax initializes its backends. Note the env var
# JAX_PLATFORMS may be force-set by the host environment, so we also pin the
# platform via jax.config, which takes precedence.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
GOLDEN_DIR = REFERENCE / "stereoDNN" / "tests" / "data"

requires_reference = pytest.mark.skipif(
    not REFERENCE.is_dir(), reason="reference tree not mounted"
)


@pytest.fixture(scope="session")
def golden_dir():
    if not GOLDEN_DIR.is_dir():
        pytest.skip("reference golden data not available")
    return GOLDEN_DIR


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(12345)
