"""Test harness configuration.

Unit/integration tests run on CPU with a virtual 8-device mesh so that
multi-chip sharding paths compile and execute without TPU hardware
(the reference's analog is its hardware-free test binary,
tests/run_tests.sh + Makefile:43-44). Benchmarks (bench.py) run on the
real chip instead and do not import this file.
"""

import os

# Must be set before the first jax import anywhere in the test session.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"
REF_GOLDEN_IQ = os.path.join(REFERENCE_DIR, "signals", "refSignalSnr0dB.iq")


@pytest.fixture(scope="session")
def golden_iq_path():
    if not os.path.exists(REF_GOLDEN_IQ):
        pytest.skip("reference golden capture not available")
    return REF_GOLDEN_IQ


@pytest.fixture()
def rng():
    return np.random.default_rng(20260816)
