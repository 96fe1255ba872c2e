"""Attribute codec: convert node/edge labels among int / ddpm / bits / one_hot.

Functional JAX counterpart of the reference codec
(reference: DiffuseSG/utils/attribute_code.py:13-430).  Every conversion
routes through the integer encoding; all conversions are vectorized,
jit-safe, static-shape.

Layout convention (channels-LAST):
  int / ddpm:  nodes [B, N], adjs [B, N, N]
  bits / one_hot: nodes [B, N, C], adjs [B, N, N, C]
(the reference stores adj channels first, [B, C, N, N]; here the channel
axis is last so it maps onto TPU lanes).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .masking import mask_adjs, mask_nodes

ENCODINGS = ("int", "ddpm", "bits", "one_hot")


def _infer_mask_func(attr: jax.Array, flag_nodes: bool, flag_adjs: bool):
    if flag_adjs and not flag_nodes:
        return mask_adjs
    if flag_nodes and not flag_adjs:
        return mask_nodes
    # infer from rank, valid only for scalar-per-entry tensors (reference quirk:
    # attribute_code.py:64-85 infers from shape when both flags are False)
    if attr.ndim == 3:
        return mask_adjs
    if attr.ndim == 2:
        return mask_nodes
    raise ValueError("cannot infer node/adj kind; pass flag_nodes or flag_adjs")


def num_bits_for(num_attr_type: int) -> int:
    return int(math.ceil(math.log2(num_attr_type)))


def dec2bin(dec: jax.Array, num_bits: int) -> jax.Array:
    """[..., ] int -> [..., num_bits] float of 0/1, MSB first.

    Reference: attribute_code.py:307-316.
    """
    masks = (2 ** jnp.arange(num_bits - 1, -1, -1)).astype(jnp.int32)
    bits = jnp.bitwise_and(dec.astype(jnp.int32)[..., None], masks) != 0
    return bits.astype(jnp.float32)


def bin2dec(bits: jax.Array, num_bits: int) -> jax.Array:
    """[..., num_bits] 0/1 -> [...] float decimal, MSB first.

    Reference: attribute_code.py:319-328.
    """
    masks = (2 ** jnp.arange(num_bits - 1, -1, -1)).astype(bits.dtype)
    return jnp.sum(masks * bits, axis=-1)


def attribute_int_to_ddpm(in_attr, attr_flags, num_attr_type,
                          flag_nodes=False, flag_adjs=False):
    """int [0..K-1] -> ddpm scalar in [-1, 1]: y = 2 i / (K-1) - 1.

    Reference: attribute_code.py:240-254.
    """
    mask_fn = _infer_mask_func(in_attr, flag_nodes, flag_adjs)
    out = 2.0 * in_attr.astype(jnp.float32) / (num_attr_type - 1.0) - 1.0
    return mask_fn(out, attr_flags)


def attribute_ddpm_to_int(in_attr, attr_flags, num_attr_type,
                          flag_nodes=False, flag_adjs=False):
    """ddpm scalar in [-1, 1] -> int via nearest-interval quantization.

    Equivalent to the reference's per-interval loop (attribute_code.py:123-176)
    but vectorized: interval boundaries between i and i+1 sit at
    -1 + (i + 0.5) * delta with delta = 2/(K-1); a boundary value maps to the
    LOWER index (the reference uses half-open (min, max] intervals).
    """
    mask_fn = _infer_mask_func(in_attr, flag_nodes, flag_adjs)
    delta = 2.0 / (num_attr_type - 1.0)
    idx = jnp.ceil((in_attr.astype(jnp.float32) + 1.0) / delta - 0.5)
    idx = jnp.clip(idx, 0, num_attr_type - 1)
    return mask_fn(idx, attr_flags)


def attribute_int_to_bits(in_attr, attr_flags, num_attr_type, flag_ddpm_range=True,
                          flag_nodes=False, flag_adjs=False):
    """int [0..K-1] -> [.., ceil(log2 K)] bits (channels-last), -1/1 if ddpm range.

    Reference: attribute_code.py:257-280 (which emits [B, C, N, N]; we emit
    [B, N, N, C]).
    """
    mask_fn = _infer_mask_func(in_attr, flag_nodes, flag_adjs)
    out = dec2bin(in_attr, num_bits_for(num_attr_type))  # [..., C]
    if flag_ddpm_range:
        out = 2.0 * out - 1.0
    return mask_fn(out, attr_flags)


def attribute_bits_to_int(in_attr, attr_flags, num_attr_type, flag_in_ddpm_range=True,
                          flag_clamp_int=False, flag_nodes=False, flag_adjs=False):
    """bits (channels-last) -> int. Reference: attribute_code.py:179-209."""
    if flag_adjs or (not flag_nodes and in_attr.ndim == 4):
        mask_fn = mask_adjs
    else:
        mask_fn = mask_nodes
    bits = in_attr
    if flag_in_ddpm_range:
        bits = (bits + 1.0) / 2.0
        bits = mask_fn(bits, attr_flags)
    out = bin2dec(bits, num_bits=bits.shape[-1])
    if flag_clamp_int:
        out = jnp.clip(out, 0, num_attr_type - 1)
    return mask_fn(out, attr_flags)


def attribute_int_to_one_hot(in_attr, attr_flags, num_attr_type, flag_ddpm_range=True,
                             flag_nodes=False, flag_adjs=False):
    """int [0..K-1] -> [.., K] one-hot (channels-last), -1/1 if ddpm range.

    Reference: attribute_code.py:283-304.
    """
    mask_fn = _infer_mask_func(in_attr, flag_nodes, flag_adjs)
    out = jax.nn.one_hot(in_attr.astype(jnp.int32), num_attr_type, dtype=jnp.float32)
    if flag_ddpm_range:
        out = 2.0 * out - 1.0
    return mask_fn(out, attr_flags)


def attribute_one_hot_to_int(in_attr, attr_flags, num_attr_type, flag_in_ddpm_range=True,
                             flag_nodes=False, flag_adjs=False):
    """one-hot (channels-last) -> int via argmax. Reference: attribute_code.py:212-237."""
    if flag_adjs or (not flag_nodes and in_attr.ndim == 4):
        mask_fn = mask_adjs
    else:
        mask_fn = mask_nodes
    x = in_attr
    if flag_in_ddpm_range:
        x = (x + 1.0) / 2.0
        x = mask_fn(x, attr_flags)
    out = jnp.argmax(x, axis=-1).astype(jnp.float32)
    return mask_fn(out, attr_flags)


def attribute_converter(in_attr, attr_flags, in_encoding, out_encoding, num_attr_type,
                        flag_nodes=False, flag_adjs=False,
                        flag_in_ddpm_range=True, flag_out_ddpm_range=True,
                        flag_clamp_int=False):
    """Convert among int/ddpm/bits/one_hot through the int intermediate.

    Reference: attribute_code.py:13-61.  Shapes are channels-last (see module
    docstring); otherwise the semantics, argument names and defaults match.
    """
    if in_encoding not in ENCODINGS or out_encoding not in ENCODINGS:
        raise ValueError(f"encodings must be one of {ENCODINGS}")

    if in_encoding == "int":
        int_attr = in_attr
    elif in_encoding == "ddpm":
        int_attr = attribute_ddpm_to_int(in_attr, attr_flags, num_attr_type,
                                         flag_nodes=flag_nodes, flag_adjs=flag_adjs)
    elif in_encoding == "bits":
        int_attr = attribute_bits_to_int(in_attr, attr_flags, num_attr_type,
                                         flag_in_ddpm_range, flag_clamp_int,
                                         flag_nodes=flag_nodes, flag_adjs=flag_adjs)
    else:  # one_hot
        int_attr = attribute_one_hot_to_int(in_attr, attr_flags, num_attr_type,
                                            flag_in_ddpm_range,
                                            flag_nodes=flag_nodes, flag_adjs=flag_adjs)

    if out_encoding == "int":
        return int_attr
    if out_encoding == "ddpm":
        return attribute_int_to_ddpm(int_attr, attr_flags, num_attr_type,
                                     flag_nodes=flag_nodes, flag_adjs=flag_adjs)
    if out_encoding == "bits":
        return attribute_int_to_bits(int_attr, attr_flags, num_attr_type,
                                     flag_out_ddpm_range,
                                     flag_nodes=flag_nodes, flag_adjs=flag_adjs)
    return attribute_int_to_one_hot(int_attr, attr_flags, num_attr_type,
                                    flag_out_ddpm_range,
                                    flag_nodes=flag_nodes, flag_adjs=flag_adjs)


def reshape_node_attr_vec_to_mat(node_attr_vec, node_flags_vec, matrix_size):
    """Pack node attributes into an adj-shaped grid (node-only mode).

    [B, N](, C) -> [B, M, M](, C) channels-last, plus [B, M, M] flags.
    Reference: attribute_code.py:331-368 (which returns [B, C, M, M]).
    """
    b, n = node_attr_vec.shape[:2]
    m = matrix_size
    pad = m * m - n
    if pad < 0:
        raise ValueError(f"matrix_size^2={m*m} < vector length {n}")
    flags_mat = jnp.pad(node_flags_vec.astype(jnp.float32), ((0, 0), (0, pad))).reshape(b, m, m)
    if node_attr_vec.ndim == 2:
        attr_mat = jnp.pad(node_attr_vec, ((0, 0), (0, pad))).reshape(b, m, m)
    elif node_attr_vec.ndim == 3:
        c = node_attr_vec.shape[-1]
        attr_mat = jnp.pad(node_attr_vec, ((0, 0), (0, pad), (0, 0))).reshape(b, m, m, c)
    else:
        raise ValueError(f"bad node_attr shape {node_attr_vec.shape}")
    flags_mat = flags_mat.astype(bool)
    return mask_adjs(attr_mat, flags_mat), flags_mat


def reshape_node_attr_mat_to_vec(node_attr_mat, node_flags_mat, vector_size):
    """Unpack adj-shaped node attributes back to vector form (node-only mode).

    [B, M, M](, C) channels-last -> [B, N](, C), plus [B, N] flags.
    Reference: attribute_code.py:371-430.
    """
    b = node_attr_mat.shape[0]
    m = node_attr_mat.shape[1]
    flat_len = m * m

    def _fit(x_flat):
        if vector_size >= flat_len:
            pad_widths = [(0, 0)] * x_flat.ndim
            pad_widths[1] = (0, vector_size - flat_len)
            return jnp.pad(x_flat, pad_widths)
        return x_flat[:, :vector_size]

    flags_vec = _fit(node_flags_mat.astype(jnp.float32).reshape(b, -1)).astype(bool)
    if node_attr_mat.ndim == 3:
        attr_vec = _fit(node_attr_mat.reshape(b, -1))
    elif node_attr_mat.ndim == 4:
        c = node_attr_mat.shape[-1]
        attr_vec = _fit(node_attr_mat.reshape(b, flat_len, c))
    else:
        raise ValueError(f"bad node_attr shape {node_attr_mat.shape}")
    return mask_nodes(attr_vec, flags_vec), flags_vec
