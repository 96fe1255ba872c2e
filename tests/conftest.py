"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native substitute for a fake NCCL backend (SURVEY.md §4):
multi-device sharding tests execute on XLA's host platform with 8 virtual
devices, so the exact pjit/shard_map code paths used on a TPU pod are
exercised in CI without TPU hardware.
"""
import os

# force-override: the environment may preset JAX_PLATFORMS (e.g. a TPU plugin
# registered from sitecustomize), so env vars alone are not reliable here —
# use jax.config, which wins over both.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# the suite is compile-bound on this 1-core box: persist XLA executables
# across runs (same cache bench.py uses on TPU; keyed by HLO hash, so stale
# entries are impossible)
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
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


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: everything not explicitly marked ``slow`` gets the
    ``fast`` marker, so `pytest -m fast` is the quick regression tier
    (<10 min on this box) and plain `pytest` stays the full nightly run."""
    import pytest as _pytest

    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(_pytest.mark.fast)
