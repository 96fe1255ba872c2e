"""Tensor-parallel (2-D mesh) sharding rules for the DiffuseSG denoiser.

The reference's only parallelism is DDP over the batch
(DiffuseSG/utils/dist_training.py:62-85).  On a TPU pod slice the natural
extension is a 2-D ``(data, model)`` mesh: batch over the ``data`` axis and
Megatron-style tensor parallelism over ``model`` for the transformer
matmuls — column-parallel qkv/fc1, row-parallel proj/fc2 — expressed purely
as NamedSharding annotations on the parameter pytree.  XLA's SPMD
partitioner propagates the layouts through the forward/backward and
inserts the psums over ICI; no communication code is written here.

Sharding map (axis sharded on ``model``):

  qkv_kernel      [C, 3C]    out axis   (column-parallel attention in-proj)
  qkv_bias        [3C]       out axis
  mlp_fc1_kernel  [C, 4C]    out axis   (column-parallel MLP up-proj)
  mlp_fc1_bias    [4C]       out axis
  proj_kernel     [C, C]     in axis    (row-parallel attention out-proj)
  mlp_fc2_kernel  [4C, C]    in axis    (row-parallel MLP down-proj)
  everything else            replicated (norms, biases after row-parallel
                             matmuls, readouts, patch resample, noise MLP)

Leaves whose target axis is not divisible by the ``model`` mesh size fall
back to replicated, so any (dp, tp) factorization is safe.  The same rules
apply to optimizer moments and the stacked-[K, ...] EMA copies (their
trailing axes mirror the parameter axes), optionally combined with ZeRO-1
sharding of a *different* axis over ``data``.

Note: tensor parallelism uses the XLA attention path.  The Pallas fused
kernels are single-chip programs (tpu_custom_call is opaque to the SPMD
partitioner), so configs running tp > 1 set use_pallas_attention: false.
SETTLED (round 3): no shard_map TP wrapper will be built — roofline
arithmetic from the measured kernel numbers shows TP is a net loss at this
model size (activation psums alone cost 5-10 ms/eval vs 7.8 ms of compute
saved; docs/PARALLELISM.md "TP×Pallas: settled").  TP remains a
correctness-verified hook for much wider model variants.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Param-name -> which axis is tensor-parallel (counting from the end, so the
# same rule covers the plain leaf, Adam moments, and the [K, ...] EMA stack).
_COL_PARALLEL = ("qkv_kernel", "qkv_bias", "mlp_fc1_kernel", "mlp_fc1_bias")
_ROW_PARALLEL = ("proj_kernel", "mlp_fc2_kernel")


def make_mesh_2d(dp: int, tp: int, devices=None,
                 data_axis: str = "data", model_axis: str = "model") -> Mesh:
    """A (dp, tp) mesh with the model axis innermost (adjacent devices share
    the fastest ICI links, which is where the per-layer psums run)."""
    devs = list(devices if devices is not None else jax.devices())
    if dp * tp > len(devs):
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, have {len(devs)}")
    grid = np.asarray(devs[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (data_axis, model_axis))


def _leaf_name(path) -> str:
    for entry in reversed(path):
        key = getattr(entry, "key", getattr(entry, "name", None))
        if key is not None:
            return str(key)
    return ""


def _tp_axis(name: str, ndim: int):
    """Axis index (>=0) to shard on the model axis, or None."""
    if name in _COL_PARALLEL:
        return ndim - 1
    if name in _ROW_PARALLEL and ndim >= 2:
        return ndim - 2
    return None


def tp_param_shardings(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """NamedSharding pytree for the model parameters under tensor parallelism.

    Leaves whose tensor-parallel axis does not divide the ``model`` mesh size
    fall back to replication — WITH a warning naming them, so a degenerate
    factorization (e.g. tp=3 against C=96 heads-of-3 stages) is visible
    instead of silently running replicated."""
    import logging

    tp = mesh.shape[model_axis]
    fallbacks = []

    def _sh(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        spec = [None] * ndim
        ax = _tp_axis(_leaf_name(path), ndim)
        if ax is not None and ndim:
            if leaf.shape[ax] % tp == 0 and leaf.shape[ax] >= tp:
                spec[ax] = model_axis
            else:
                fallbacks.append((jax.tree_util.keystr(path),
                                  tuple(leaf.shape), ax))
        while spec and spec[-1] is None:  # P(None,) -> P(): plain replication
            spec.pop()
        return NamedSharding(mesh, P(*spec))

    out = jax.tree_util.tree_map_with_path(_sh, params)
    if fallbacks:
        logging.warning(
            "tensor parallelism: %d leaves fall back to REPLICATED (their "
            "tp axis is not divisible by model=%d): %s%s — these layers run "
            "unsharded and pay no-op collectives; pick a tp that divides "
            "the stage channel counts", len(fallbacks), tp,
            "; ".join(f"{n} shape={s} axis={a}" for n, s, a in fallbacks[:4]),
            " ..." if len(fallbacks) > 4 else "")
    return out


def tp_state_shardings(tree: Any, mesh: Mesh, data_axis: str = "data",
                       model_axis: str = "model", zero1: bool = True) -> Any:
    """Sharding pytree for optimizer moments / EMA stacks: the parameter's
    tensor-parallel axis on ``model`` plus (optionally) ZeRO-1 on ``data``
    over the largest *remaining* divisible axis."""
    tp = mesh.shape[model_axis]
    dp = mesh.shape[data_axis]

    def _sh(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0:
            return NamedSharding(mesh, P())
        spec = [None] * ndim
        ax = _tp_axis(_leaf_name(path), ndim)
        if ax is not None and leaf.shape[ax] % tp == 0 and leaf.shape[ax] >= tp:
            spec[ax] = model_axis
        else:
            ax = None
        if zero1 and dp > 1:
            from .mesh import largest_divisible_axis
            best_axis = largest_divisible_axis(leaf.shape, dp, exclude=ax)
            if best_axis is not None:
                spec[best_axis] = data_axis
        while spec and spec[-1] is None:
            spec.pop()
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(_sh, tree)
