"""Test harness configuration.

Unit/integration tests run on CPU with a virtual 8-device mesh so that
multi-chip sharding paths compile and execute without TPU hardware
(the reference's analog is its hardware-free test binary,
tests/run_tests.sh + Makefile:43-44). Benchmarks (bench.py) run on the
real chip instead and do not import this file.
"""

import os

# Force CPU before the backend initializes. NB: on this host jax is
# pre-imported with JAX_PLATFORMS=axon (the TPU tunnel), so the env var
# alone is not enough — jax.config.update is authoritative.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the vmapped decode pipeline is a large
# CPU compile; cache it across test processes (repo-local, gitignored).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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
