"""Decode raw diffusion outputs into integer scene graphs + bboxes.

JAX counterpart of the quantization/post-processing inside the reference
sampling orchestrator (reference:
DiffuseSG/runner/sampler/sampler_node_adj.py:179-307): clamp to [-1, 1],
sign-binarize bits/one_hot channels, interval-quantize ddpm scalars, split and
rescale the bbox slice, and remove self-loops.  Everything is jit-safe and
runs on device; only the final int tensors cross to host.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attribute_code import (
    attribute_converter, bin2dec, num_bits_for,
)
from ..ops.masking import mask_adjs, mask_nodes


class DecodedSamples(NamedTuple):
    node_types: jax.Array | None  # [B, N] int
    adj_types: jax.Array          # [B, N, N] int
    bboxes: jax.Array | None      # [B, N, 4] float in [0, 1]


def split_bbox_nodes(nodes: jax.Array, node_flags: jax.Array):
    """Split the trailing 4 bbox channels and rescale [-1,1] -> [0,1]
    (reference: sampler_node_adj.py:194-210)."""
    node_attr, bbox = nodes[..., :-4], nodes[..., -4:]
    bbox = mask_nodes(bbox * 0.5 + 0.5, node_flags)
    return node_attr, bbox


def decode_node(node_samples: jax.Array, node_flags: jax.Array, encoding: str,
                num_node_type: int) -> jax.Array:
    """Quantize node-type channels to ints (reference: sampler_node_adj.py:222-240)."""
    x = jnp.clip(node_samples, -1.0, 1.0)
    if encoding == "bits":
        bits = (x > 0.0).astype(jnp.float32)  # [B, N, C]
        bits = mask_nodes(bits, node_flags)
        out = bin2dec(bits, num_bits_for(num_node_type))
        out = jnp.clip(mask_nodes(out, node_flags), 0, num_node_type - 1)
        return out.astype(jnp.int32)
    if encoding == "one_hot":
        x = jnp.where(x > 0.0, 1.0, -1.0)
        x = mask_nodes(x, node_flags)
        out = attribute_converter(x, node_flags, "one_hot", "int", num_node_type,
                                  flag_nodes=True, flag_in_ddpm_range=True)
        return out.astype(jnp.int32)
    if encoding == "ddpm":
        if x.ndim == 3 and x.shape[-1] == 1:
            x = x[..., 0]
        out = attribute_converter(x, node_flags, "ddpm", "int", num_node_type,
                                  flag_nodes=True, flag_in_ddpm_range=True)
        return out.astype(jnp.int32)
    raise NotImplementedError(f"unknown encoding {encoding}")


def decode_adj(adj_samples: jax.Array, node_flags: jax.Array, encoding: str,
               num_adj_type: int, remove_self_loops: bool = True) -> jax.Array:
    """Quantize edge-type channels to ints (reference: sampler_node_adj.py:242-285)."""
    x = jnp.clip(adj_samples, -1.0, 1.0)
    if encoding == "bits":
        if x.ndim == 3:
            x = x[..., None]  # binary-edge squeeze undone (reference :266-267)
        bits = (x > 0.0).astype(jnp.float32)  # [B, N, N, C]
        bits = mask_adjs(bits, node_flags)
        out = bin2dec(bits, num_bits_for(num_adj_type))
        out = jnp.clip(mask_adjs(out, node_flags), 0, num_adj_type - 1)
    elif encoding == "one_hot":
        x = jnp.where(x > 0.0, 1.0, -1.0)
        x = mask_adjs(x, node_flags)
        out = attribute_converter(x, node_flags, "one_hot", "int", num_adj_type,
                                  flag_adjs=True, flag_in_ddpm_range=True)
    elif encoding == "ddpm":
        if x.ndim == 4 and x.shape[-1] == 1:
            x = x[..., 0]
        out = attribute_converter(x, node_flags, "ddpm", "int", num_adj_type,
                                  flag_adjs=True, flag_in_ddpm_range=True)
    else:
        raise NotImplementedError(f"unknown encoding {encoding}")
    if remove_self_loops and node_flags.ndim == 2:
        n = out.shape[-1]
        out = out * (1.0 - jnp.eye(n, dtype=out.dtype))
    return out.astype(jnp.int32)


def decode_samples(adjs: jax.Array, nodes: jax.Array, node_flags: jax.Array,
                   node_encoding: str, edge_encoding: str,
                   num_node_type: int, num_adj_type: int,
                   flag_bbox: bool = True, flag_node_only: bool = False) -> DecodedSamples:
    """Full decode path for joint samples (reference: sampler_node_adj.py:194-307)."""
    bbox = None
    if flag_node_only:
        if flag_bbox:
            adj_attr, bbox_grid = adjs[..., :-4], adjs[..., -4:]
            bbox_grid = mask_adjs(bbox_grid * 0.5 + 0.5, node_flags)
            adjs = adj_attr
            # bbox unpacking to vector form is done host-side by the caller
            bbox = bbox_grid
        adj_types = decode_adj(adjs, node_flags, edge_encoding, num_node_type,
                               remove_self_loops=False)
        return DecodedSamples(None, adj_types, bbox)

    if flag_bbox:
        nodes, bbox = split_bbox_nodes(nodes, node_flags)
    node_types = decode_node(nodes, node_flags, node_encoding, num_node_type)
    adj_types = decode_adj(adjs, node_flags, edge_encoding, num_adj_type)
    return DecodedSamples(node_types, adj_types, bbox)
