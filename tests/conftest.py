"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware, as the reference validates multi-file datasets with
in-memory mocks -- ref go/minp/snapshot/mock.go).  The env vars must be set
before jax initializes, hence at conftest import time.
"""

import os
import sys

# Force assignment: the session environment exports JAX_PLATFORMS=axon
# (the real-TPU tunnel); tests must be hermetic and run on the virtual
# CPU mesh.  Real-chip validation lives in bench.py / tools/.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # for subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize imports jax at interpreter startup and
# latches jax_platforms=axon from the env BEFORE this file runs; setting
# os.environ above is then too late.  Override the latched config
# directly (backends have not initialized yet at collection time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def tmp_minnow(tmp_path):
    def _make(name="file.minnow"):
        return str(tmp_path / name)

    return _make
