"""Multi-host bootstrap: the TPU-native replacement for the reference's NCCL
rendezvous (reference: DiffuseSG/utils/dist_training.py:100-126, which reads
torchrun/OMPI env vars and calls init_process_group(env://)).

On JAX the equivalent is one jax.distributed.initialize() call per host
process.  On TPU pods the coordinator/process-id/process-count are discovered
from the TPU metadata automatically; on other platforms (and in the CPU
two-process smoke test) the same torchrun-compatible env vars the reference
honors — plus JAX-native DSG_COORDINATOR/DSG_NUM_PROCESSES/DSG_PROCESS_ID —
select an explicit rendezvous.
"""
from __future__ import annotations

import logging
import os

import jax

_INITIALIZED = False


def detect_rendezvous() -> dict | None:
    """Find explicit rendezvous parameters in the environment.

    Honors (in order): DSG_* (this framework's native knobs), torchrun-style
    MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE, and OMPI_COMM_WORLD_* like the
    reference (dist_training.py:105-115).  Returns None if nothing is set —
    then jax.distributed's own auto-detection (TPU pod metadata / SLURM)
    decides whether multi-host applies.
    """
    env = os.environ
    if "DSG_COORDINATOR" in env:
        return {
            "coordinator_address": env["DSG_COORDINATOR"],
            "num_processes": int(env["DSG_NUM_PROCESSES"]),
            "process_id": int(env["DSG_PROCESS_ID"]),
        }
    if "MASTER_ADDR" in env and "RANK" in env and "WORLD_SIZE" in env:
        return {
            "coordinator_address": f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '12355')}",
            "num_processes": int(env["WORLD_SIZE"]),
            "process_id": int(env["RANK"]),
        }
    if "OMPI_COMM_WORLD_RANK" in env and "MASTER_ADDR" in env:
        return {
            "coordinator_address": f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '12355')}",
            "num_processes": int(env["OMPI_COMM_WORLD_SIZE"]),
            "process_id": int(env["OMPI_COMM_WORLD_RANK"]),
        }
    return None


def maybe_initialize_distributed(force: bool = False) -> bool:
    """Initialize jax.distributed once per process if configured.

    Returns True when running multi-process after the call.  Safe to call
    multiple times and in single-host runs (no env set -> no-op, unless
    ``force`` asks for jax.distributed auto-detection, e.g. on TPU pods).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    # NB: nothing here may touch the XLA backend (jax.devices /
    # process_count / device_put) before initialize() runs
    rdv = detect_rendezvous()
    if rdv is None and not force:
        return False
    try:
        if rdv is not None:
            jax.distributed.initialize(**rdv)
        else:
            jax.distributed.initialize()  # TPU-pod/SLURM auto-detection
        _INITIALIZED = True
        logging.info("jax.distributed initialized: process %d / %d",
                     jax.process_index(), jax.process_count())
    except Exception as e:
        if rdv is not None:
            # The user EXPLICITLY configured a multi-host rendezvous.
            # Degrading to single-process here would let every host think
            # it is process 0 and write the same checkpoints/CSVs/logs —
            # silent corruption.  Fail hard instead (the reference's
            # init_process_group raises on a failed rendezvous too,
            # dist_training.py:100-126).
            raise RuntimeError(
                f"multi-host rendezvous was configured ({rdv}) but "
                f"jax.distributed.initialize failed: {e}") from e
        # auto-detection probe (force=True) found nothing usable:
        # single-process is the correct interpretation
        logging.warning("jax.distributed auto-detection failed (%s); "
                        "continuing single-process", e)
    return jax.process_count() > 1
