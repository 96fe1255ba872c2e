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


def _warmup_collectives() -> None:
    """Establish the cross-process collective context at init time.

    The communicator clique over all global devices is created lazily by the
    FIRST collective dispatch, under a short rendezvous deadline (30 s for
    XLA's CPU Gloo backend).  If hosts reach their first real collective at
    very different times — one host hits a warm compilation cache while
    another compiles the train step from scratch — that deadline trips and
    the job dies with "Gloo context initialization failed".  Dispatching one
    tiny all-reduce here, when every process is at the same (post-initialize)
    point, performs the rendezvous while the skew is milliseconds; later
    collectives reuse the established clique and simply wait.  The reference
    has the same pattern implicitly: init_process_group builds the NCCL
    communicator up front (dist_training.py:100-126)."""
    try:
        import numpy as np
        from jax.experimental import multihost_utils

        # NB: sync_global_devices is a coordination-SERVICE barrier in
        # current jax (no device collective), so it would not build the
        # communicator; process_allgather dispatches a real all-gather
        # over every global device
        out = multihost_utils.process_allgather(
            np.asarray([jax.process_index()], np.int32))
        assert len(out.ravel()) == jax.process_count()
        logging.info("collective warm-up all-gather complete")
    except Exception as e:  # never fail init over a warm-up
        logging.warning("collective warm-up failed (%s); first real "
                        "collective will pay the rendezvous", e)


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
    # CPU backend: XLA's Gloo collectives time out their store rendezvous
    # after 30 s by default — each compiled program's FIRST collective pays
    # this, and compile-time skew between hosts (one hits a warm persistent
    # cache, another compiles for minutes) easily exceeds it.  Raise it
    # before backend init; the flag is CPU-only so gate on the configured
    # platform (TPU ICI collectives have their own launch timeouts).
    try:
        plats = jax.config.jax_platforms or ""
    except AttributeError:  # very old jax: leave flags alone
        plats = ""
    if "cpu" in plats:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_cpu_collective_timeout_seconds" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_cpu_collective_timeout_seconds=600").strip()
    try:
        if rdv is not None:
            jax.distributed.initialize(**rdv)
        else:
            jax.distributed.initialize()  # TPU-pod/SLURM auto-detection
        _INITIALIZED = True
        logging.info("jax.distributed initialized: process %d / %d",
                     jax.process_index(), jax.process_count())
        if jax.process_count() > 1:
            _warmup_collectives()
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


class FencedJit:
    """Dispatch fence for a jitted program with cross-process collectives.

    XLA:CPU's Gloo backend builds one communicator clique per compiled
    program, and the clique's context init waits on the coordination KV
    store with a FIXED ~30 s deadline (observed:
    "Gloo context initialization failed: DEADLINE_EXCEEDED: GetKeyValue()
    timed out ... duration: 29.99s" — NOT governed by
    --xla_cpu_collective_timeout_seconds, which only covers collective
    execution).  If peer processes reach a new program's first dispatch more
    than ~30 s apart — exactly what happens when one host compiles a heavy
    program from a warm persistent cache and another from scratch, or when a
    loaded 1-core box timeshares two compiling children unfairly — the early
    process times out and the job dies.

    The fence removes the skew instead of fighting the deadline: on the
    first call it AOT-compiles the program (compilation is process-local, no
    communication), then joins a coordination-service barrier (minutes-long
    timeout, no Gloo), and only then dispatches — so every process's first
    execution of the program starts within barrier-exit jitter
    (milliseconds).  Subsequent calls reuse the AOT executable directly.
    Single-process: zero-overhead passthrough.  The reference has no
    counterpart because NCCL communicators are built once up front
    (dist_training.py:100-126); XLA builds them lazily per program.
    """

    def __init__(self, jitted, tag: str):
        self._jitted = jitted
        self._tag = tag
        self._compiled = None
        self._fenced = False

    def __call__(self, *args):
        if not self._fenced:
            if jax.process_count() > 1:
                # mark fenced only AFTER a successful compile+barrier: a
                # transient failure here must leave the fence armed for the
                # caller's retry, not fall through to an un-fenced dispatch
                self._compiled = self._jitted.lower(*args).compile()
                from .mesh import sync_hosts
                sync_hosts(self._tag)
            self._fenced = True
        fn = self._compiled if self._compiled is not None else self._jitted
        return fn(*args)
