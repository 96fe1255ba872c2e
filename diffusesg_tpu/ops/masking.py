"""Masking and symmetric-noise primitives for padded graph tensors.

Functional JAX counterparts of the reference mask/noise layer
(reference: DiffuseSG/utils/graph_utils.py:5-152).  All functions are pure,
jit-safe, static-shape, and broadcast-based: instead of the reference's
in-place ``masked_fill_``, invalid entries are produced with ``jnp.where``
(or a multiplicative mask when ``value == 0``), which XLA fuses into
neighbouring element-wise ops for free.

Layout convention (channels-LAST, TPU-native):
  adjs:       [B, N, N] or [B, N, N, C]
  nodes:      [B, N]    or [B, N, C]
  node_flags: [B, N] bool/float, or [B, N, N] for element-wise (node-only) mode
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def adj_mask_2d(node_flags: jax.Array) -> jax.Array:
    """Outer-product validity mask over node pairs.

    @param node_flags: [B, N] (any dtype; nonzero == valid) or [B, N, N]
    @return mask: [B, N, N] bool
    """
    flags = node_flags.astype(bool)
    if flags.ndim == 2:
        return flags[:, :, None] & flags[:, None, :]
    if flags.ndim == 3:
        return flags
    raise ValueError(f"node_flags must be [B,N] or [B,N,N], got {node_flags.shape}")


def mask_adjs(adjs: jax.Array, node_flags: jax.Array, value: float = 0.0,
              col_only: bool = False) -> jax.Array:
    """Mask adjacency-shaped tensors by node validity.

    Mirrors reference semantics (graph_utils.py:5-38): with [B, N] flags the
    mask is applied along rows and columns (or columns only); with [B, N, N]
    flags the mask is element-wise.

    @param adjs: [B, N, N] or [B, N, N, C] (channels last)
    @param node_flags: [B, N] or [B, N, N]
    @param value: fill value for invalid entries
    @param col_only: mask only the column (second node) direction
    """
    flags = node_flags.astype(bool)
    if flags.ndim == 2:
        if col_only:
            mask = flags[:, None, :]
        else:
            mask = flags[:, :, None] & flags[:, None, :]
    elif flags.ndim == 3:
        if col_only:
            raise ValueError("col_only unsupported with element-wise [B,N,N] flags")
        mask = flags
    else:
        raise ValueError(f"bad node_flags shape {node_flags.shape}")

    if adjs.ndim == mask.ndim + 1:
        mask = mask[..., None]  # broadcast over trailing channel dim
    elif adjs.ndim != mask.ndim:
        raise ValueError(f"adjs shape {adjs.shape} incompatible with flags {node_flags.shape}")

    # where, not multiply: the reference's masked_fill_ zeroes even NaN/Inf
    # padded entries (0 * NaN = NaN would poison whole-tensor reductions)
    return jnp.where(mask, adjs, jnp.asarray(value, adjs.dtype))


def mask_nodes(nodes: jax.Array, node_flags: jax.Array, value: float = 0.0,
               along_dim: int | None = None) -> jax.Array:
    """Mask node-shaped tensors by node validity.

    Mirrors reference semantics (graph_utils.py:41-86) including the quirk
    that [B, N, N] flags (node-only mode) make this a no-op.

    @param nodes: [B, N] or [B, N, C]; any [B, ..., N, ...] if along_dim given
    @param node_flags: [B, N] or [B, N, N]
    """
    flags = node_flags.astype(bool)
    if flags.ndim == 3:
        return nodes  # node-only mode: flags describe the adj grid, not nodes
    if flags.ndim != 2:
        raise ValueError(f"bad node_flags shape {node_flags.shape}")

    if along_dim is None:
        if nodes.ndim == 2:
            mask = flags
        elif nodes.ndim == 3:
            mask = flags[:, :, None]
        else:
            raise ValueError(f"nodes must be [B,N] or [B,N,C], got {nodes.shape}")
    else:
        along_dim = along_dim % nodes.ndim
        shape = [1] * nodes.ndim
        shape[0] = flags.shape[0]
        shape[along_dim] = flags.shape[1]
        mask = flags.reshape(shape)

    # where, not multiply: see mask_adjs (NaN/Inf in padded entries)
    return jnp.where(mask, nodes, jnp.asarray(value, nodes.dtype))


def symmetrize(adjs: jax.Array) -> jax.Array:
    """0.5 * (A + A^T) over the two node axes (axes 1, 2 in channels-last)."""
    if adjs.ndim == 3:
        return 0.5 * (adjs + jnp.swapaxes(adjs, -1, -2))
    if adjs.ndim == 4:
        return 0.5 * (adjs + jnp.swapaxes(adjs, 1, 2))
    raise ValueError(f"bad adjs shape {adjs.shape}")


def _transpose_adj(adjs: jax.Array) -> jax.Array:
    if adjs.ndim == 4:
        return jnp.swapaxes(adjs, 1, 2)  # [B, N, N, C]
    return jnp.swapaxes(adjs, -1, -2)


def check_adjs_symmetry(adjs: jax.Array, tol: float = 1e-2) -> jax.Array:
    """Return a bool scalar: is ``adjs`` symmetric over the node axes.

    The reference asserts (graph_utils.py:89-94); under jit we can't raise on
    traced values, so this returns a checkable scalar (tests assert on it).
    """
    return jnp.abs(adjs - _transpose_adj(adjs)).sum() < tol


def pad_adjs(ori_adj: np.ndarray, node_number: int) -> np.ndarray:
    """Zero-pad a single [n, n] adjacency to [node_number, node_number] (host-side)."""
    n = ori_adj.shape[-1]
    if n == node_number:
        return ori_adj
    if n > node_number:
        raise ValueError(f"ori_len {n} > node_number {node_number}")
    out = np.zeros((node_number, node_number), dtype=ori_adj.dtype)
    out[:n, :n] = ori_adj
    return out


def get_sym_normal_noise(rng: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Symmetric Gaussian noise with zero diagonal: triu(1) noise + transpose.

    Matches reference construction (graph_utils.py:113-119): entries above the
    diagonal are N(0,1), mirrored below, and the diagonal is exactly zero.
    The node axes are the last two for 3D input or axes (1, 2) for 4D
    channels-last input.
    """
    noise = jax.random.normal(rng, shape, dtype)
    if len(shape) == 4:
        # channels-last [B, N, N, C]: upper triangle over axes (1, 2)
        n = shape[1]
        tri = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)[None, :, :, None]
        upper = noise * tri
        return upper + jnp.swapaxes(upper, 1, 2)
    n = shape[-1]
    tri = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    upper = noise * tri
    return upper + jnp.swapaxes(upper, -1, -2)


def add_sym_normal_noise(rng: jax.Array, in_tensors: jax.Array, scales: jax.Array,
                         sigmas: jax.Array, node_flags: jax.Array | None = None,
                         non_symmetric: bool = False):
    """Add per-sample-scaled (symmetric) Gaussian noise.

    Reference: graph_utils.py:122-152. ``scales``/``sigmas`` are [B] and are
    broadcast over all trailing dims.

    @return (out_tensors, noise): both masked if node_flags given.
    """
    nd = in_tensors.ndim
    scales = scales.reshape(scales.shape + (1,) * (nd - 1)).astype(in_tensors.dtype)
    sigmas = sigmas.reshape(sigmas.shape + (1,) * (nd - 1)).astype(in_tensors.dtype)
    scaled = in_tensors * scales
    if non_symmetric:
        noise = jax.random.normal(rng, in_tensors.shape, in_tensors.dtype) * sigmas
    else:
        noise = get_sym_normal_noise(rng, in_tensors.shape, in_tensors.dtype) * sigmas
    out = scaled + noise
    if node_flags is not None:
        is_adj = (nd == 4) or (nd == 3 and in_tensors.shape[-1] == in_tensors.shape[-2])
        if is_adj:
            out = mask_adjs(out, node_flags)
            noise = mask_adjs(noise, node_flags)
        else:
            out = mask_nodes(out, node_flags)
            noise = mask_nodes(noise, node_flags)
    return out, noise
