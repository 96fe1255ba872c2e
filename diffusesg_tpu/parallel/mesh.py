"""Device mesh, sharding rules, and collectives for SPMD training.

The TPU-native replacement for the reference's NCCL/DDP layer
(reference: DiffuseSG/utils/dist_training.py:10-195):
  * DDP gradient all-reduce        -> jit over a 1-D 'data' mesh; XLA inserts
                                      the psum over ICI
  * DistributedSampler             -> per-host strided batch shard (data/loader.py)
  * ZeroRedundancyOptimizer        -> optimizer/EMA state sharded with
                                      NamedSharding (ZeRO-1 for free)
  * gather_tensors (all_gather)    -> process_allgather / device_get
  * barrier                        -> multihost sync_global_devices

No custom communication code: the whole layer is sharding annotations.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis_name: str = "data",
              devices=None) -> Mesh:
    """A 1-D data-parallel mesh (the reference's only parallelism mode)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def resolve_spmd_mode(config, mesh_size: int) -> str:
    """Pick the multi-device execution strategy from ``config.tpu``.

    ``spmd_mode: auto`` (the shipped default) selects ``shard_map`` whenever
    the run is multi-device AND ``use_pallas_attention`` is on — GSPMD cannot
    partition the Pallas custom call, so under ``gspmd`` a multi-chip run
    silently falls back to the ~2x-slower XLA attention path
    (docs/PARALLELISM.md "GSPMD x Pallas").  Single-device or XLA-attention
    runs stay on ``gspmd`` (pjit + NamedSharding, ZeRO-1 state sharding).

    An EXPLICIT ``gspmd`` with Pallas on a multi-device mesh is honored but
    warned about loudly, since it is almost always a config mistake.
    """
    import logging
    tpu = config.tpu if "tpu" in config else None
    mode = tpu.get("spmd_mode", "auto") if tpu is not None else "auto"
    pallas = bool(tpu.get("use_pallas_attention", False)) if tpu is not None else False
    if mode == "auto":
        mode = "shard_map" if (mesh_size > 1 and pallas) else "gspmd"
    elif mode == "gspmd" and mesh_size > 1 and pallas:
        logging.warning(
            "tpu.spmd_mode=gspmd with use_pallas_attention on a %d-device "
            "mesh: GSPMD cannot shard the Pallas attention custom call, so "
            "this run will use the ~2x-slower XLA attention fallback. Set "
            "spmd_mode: shard_map (or auto) to keep the fused kernels.",
            mesh_size)
    return mode


def per_host_batch_size(global_batch: int, mesh_size: int) -> int:
    """Rows each host feeds per step for a configured GLOBAL batch.

    Reference DDP semantics: train.batch_size is the global batch and every
    rank loads batch_size // world_size rows (dataloader.py:24-33).  The
    per-host share is then padded down/up to local-device divisibility so
    the assembled global array shards evenly over the mesh."""
    n_proc = jax.process_count()
    local_devs = max(1, mesh_size // n_proc)
    per_host = max(1, global_batch // n_proc)
    return max(local_devs, (per_host // local_devs) * local_devs)


def batch_sharding(mesh: Mesh, ndim: int = 1, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def largest_divisible_axis(shape, size: int, exclude: int | None = None):
    """THE ZeRO-1 axis rule, shared by zero1_sharding and tp_state_shardings:
    the largest axis divisible by ``size`` (ties -> lowest index), skipping
    ``exclude``; None if no axis qualifies."""
    best_axis, best_dim = None, 0
    for axis, dim in enumerate(shape):
        if axis != exclude and dim % size == 0 and dim >= size and dim > best_dim:
            best_axis, best_dim = axis, dim
    return best_axis


def zero1_sharding(pytree: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """ZeRO-1-style sharding spec with an EXPLICIT axis rule: each leaf is
    sharded along its LARGEST axis divisible by the mesh size (ties broken by
    the lowest axis index); leaves with no such axis are replicated.

    Largest-divisible-axis is deterministic, balances shard sizes, and for
    the stacked-[K, ...] EMA pytree picks the same (parameter) axis on every
    leaf of a given kernel shape regardless of K, instead of depending on
    whether K happens to divide the mesh.  Applied to optimizer moments and
    EMA copies this reproduces what the reference gets from
    ZeroRedundancyOptimizer (learning_utils.py:130-135), plus the K EMAs.
    """
    size = mesh.shape[axis_name]

    def _spec(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        best_axis = largest_divisible_axis(leaf.shape, size)
        if best_axis is None:
            return NamedSharding(mesh, P())
        spec = [None] * leaf.ndim
        spec[best_axis] = axis_name
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(_spec, pytree)


def replicate_tree(pytree: Any, mesh: Mesh) -> Any:
    """Place a pytree fully replicated on the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), pytree)


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place host batch arrays sharded over the data axis.

    Single-process: a plain sharded device_put.  Multi-process: each host
    passes its LOCAL rows (the per-host strided shard from data/loader.py)
    and they are assembled into one global array — the jax analogue of DDP
    ranks each feeding their DistributedSampler shard (plain device_put
    would instead demand the same global value on every host).
    """
    multi = jax.process_count() > 1

    def _put(x):
        x = np.asarray(x)
        sh = batch_sharding(mesh, x.ndim, axis_name)
        if multi:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)
    return jax.tree.map(_put, batch)


def gather_to_host(x: jax.Array) -> np.ndarray:
    """Collect a (possibly sharded) array onto the host.

    Single-process: device_get handles any sharding.  Multi-process: the
    analogue of the reference's gather_tensors (dist_training.py:170-195) —
    host values (or per-host shards of a global batch-sharded array) are
    allgathered and concatenated in process order.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        # COLLECTIVE: every process must call this.  Host values / fully-
        # addressable arrays are concatenated in process order; a global
        # (non-fully-addressable) jax.Array comes back fully replicated
        # whatever its layout (batch-sharded, ZeRO-1, tensor-parallel).
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


def fetch_to_host(tree: Any) -> Any:
    """device_get a pytree, all-gathering any leaf that spans non-addressable
    devices (multi-host sharded state/metrics).  COLLECTIVE whenever such a
    leaf exists — every process must make the same call.  The single home of
    this rule (used by the trainer's metric fetch, checkpointing, and the
    eval orchestrator's params gather)."""
    def _leaf(x):
        if isinstance(x, jax.Array) and not getattr(x, "is_fully_addressable", True):
            return gather_to_host(x)
        return np.asarray(jax.device_get(x))
    return jax.tree.map(_leaf, tree)


def sync_hosts(name: str = "sync"):
    """Barrier across hosts (reference: dist_training.py:87-91 ddp_sync)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def is_main_process() -> bool:
    """Rank-0 save gate (reference: dist_training.py:151-159)."""
    return jax.process_index() == 0
