"""Test harness configuration.

Runs the whole test suite on a virtual 8-device CPU platform so that
multi-chip sharding (data/tensor parallel shard_map/pjit paths) is
exercised without TPU hardware — the fake-backend capability the
reference lacks (SURVEY.md §4).
"""

import os

# Force CPU even when the environment points JAX at a TPU platform (the
# axon sitecustomize imports jax at interpreter start, so env vars alone
# are too late — override the live config before any backend initializes).
# The suite needs 8 virtual devices for the sharding tests, and CPU keeps
# it hermetic.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules — the whole suite in
    one process otherwise accumulates hundreds of CPU executables and can
    exhaust the small CI container's memory."""
    yield
    import jax as _jax
    _jax.clear_caches()
