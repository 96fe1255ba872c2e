"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native substitute for a fake NCCL backend (SURVEY.md §4):
multi-device sharding tests execute on XLA's host platform with 8 virtual
devices, so the exact pjit/shard_map code paths used on a TPU pod are
exercised in CI without TPU hardware.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture()
def np_rng():
    return np.random.default_rng(0)
