"""Child process for the two-process jax.distributed smoke test.

Launched by tests/test_distributed.py with DSG_COORDINATOR /
DSG_NUM_PROCESSES / DSG_PROCESS_ID in the environment; exercises the real
multi-process code paths (gather_to_host / sync_hosts / is_main_process) that
are dead code under a single process.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from diffusesg_tpu.parallel.distributed import maybe_initialize_distributed
    from diffusesg_tpu.parallel.mesh import (
        gather_to_host, is_main_process, sync_hosts,
    )

    assert maybe_initialize_distributed(), "distributed init failed"
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    # per-process payload -> global gather (reference gather_tensors analogue,
    # dist_training.py:170-195)
    x = jnp.arange(6, dtype=jnp.float32).reshape(2, 3) + 100.0 * pid
    g = gather_to_host(x)
    assert g.shape == (4, 3), g.shape
    want = np.concatenate([np.arange(6, dtype=np.float32).reshape(2, 3),
                           np.arange(6, dtype=np.float32).reshape(2, 3) + 100.0])
    np.testing.assert_allclose(g, want)

    sync_hosts("smoke")  # barrier (ddp_sync analogue)
    assert is_main_process() == (pid == 0)

    # gather with uneven dtypes/shapes used by the sampling orchestrator
    ids = gather_to_host(jnp.asarray([pid], jnp.int32))
    np.testing.assert_array_equal(ids, [0, 1])
    print(f"CHILD_OK {pid} main={int(is_main_process())}", flush=True)


if __name__ == "__main__":
    main()
