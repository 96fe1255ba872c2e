"""Fused window attention Pallas TPU kernel.

The W-MSA hot loop of the Swin denoiser
(reference: DiffuseSG/model/diffusesg/diffusesg.py:108-139): per window,
softmax(q k^T * scale + rel_pos_bias [+ shift_mask]) v.  XLA executes this as
several batched matmuls with the [nWB, nH, L, L] score tensor round-tripping
through HBM; this kernel keeps scores resident in VMEM — one HBM read of
q/k/v and one write of the output per window tile.

Layout: q, k, v as [nWB, nH, L, hd] (window-batch major, so a tile of TB
consecutive windows shares one image's mask rows when TB | nW).  The bias is
passed split as rel_bias [nH, L, L] plus optional mask [nW, L, L] — never
materialized at [nWB, nH, L, L].

Backward pass: custom_vjp recomputing attention with plain XLA ops (the
standard recompute strategy; scores are cheap to rebuild relative to storing
them).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


INTERPRET = False


def _attention_xla(q, k, v, rel_bias, mask, scale):
    """Reference XLA path: q,k,v [nWB, nH, L, hd]; rel_bias [nH, L, L];
    mask [nW, L, L] or None."""
    scores = jnp.einsum("bhld,bhmd->bhlm", q * scale, k,
                        preferred_element_type=jnp.float32)
    scores = scores + rel_bias[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        nwb = q.shape[0]
        m = jnp.tile(mask.astype(jnp.float32)[:, None], (nwb // nw, 1, 1, 1))
        scores = scores + m
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhlm,bhmd->bhld", probs, v)


def _fused_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, tb, scale):
    """One (window-tile, head) program: scores never leave VMEM."""
    bias = bias_ref[0].astype(jnp.float32)  # [L, L]
    for t in range(tb):  # static unroll over the window tile
        q = q_ref[t, 0]                      # [L, hd]
        k = k_ref[t, 0]
        v = v_ref[t, 0]
        scores = jax.lax.dot_general(
            (q * scale).astype(q.dtype), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [L, L]
        scores = scores + bias
        if mask_ref is not None:
            scores = scores + mask_ref[t].astype(jnp.float32)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        o_ref[t, 0] = jax.lax.dot_general(
            probs.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pick_tile(nwb: int, nw: int) -> int:
    """Largest power-of-two window tile that divides both nWB and nW."""
    tb = 8
    while tb > 1 and (nwb % tb or nw % tb):
        tb //= 2
    return tb


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_attention(q, k, v, rel_bias, mask, scale):
    return _fused_attention_fwd_impl(q, k, v, rel_bias, mask, scale)


def _fused_attention_fwd_impl(q, k, v, rel_bias, mask, scale):
    if jax.default_backend() != "tpu" and not INTERPRET:
        # off-TPU the interpreter would crawl through the unrolled kernel;
        # use the exact XLA composition like every sibling ops kernel
        # (tests set INTERPRET=True to exercise the kernel itself)
        return _attention_xla(q, k, v, rel_bias, mask, scale)
    nwb, nh, L, hd = q.shape
    # tb must divide nW only for the mask block indexing (i % nper); with no
    # mask the tile is constrained by nWB alone — nw=1 here would force
    # tb=1, i.e. one window per program, 8x the dispatch overhead
    nw = mask.shape[0] if mask is not None else nwb
    tb = _pick_tile(nwb, nw)
    grid = (nwb // tb, nh)
    interpret = jax.default_backend() != "tpu"  # INTERPRET-forced path

    qkv_spec = pl.BlockSpec((tb, 1, L, hd), lambda i, h: (i, h, 0, 0),
                            memory_space=pl.ANY if interpret else pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, L, L), lambda i, h: (h, 0, 0),
                             memory_space=pl.ANY if interpret else pltpu.VMEM)
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    args = [q, k, v, rel_bias]
    if mask is not None:
        nper = nw // tb  # tb | nw guaranteed by _pick_tile
        mask_spec = pl.BlockSpec((tb, L, L), lambda i, h: (i % nper, 0, 0),
                                 memory_space=pl.ANY if interpret else pltpu.VMEM)
        in_specs.append(mask_spec)
        args.append(mask)
        kernel = functools.partial(_fused_kernel, tb=tb, scale=scale)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, br, orf, tb, scale: _fused_kernel(
                qr, kr, vr, br, None, orf, tb=tb, scale=scale),
            tb=tb, scale=scale)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(*args)
    return out


def _fused_attention_fwd(q, k, v, rel_bias, mask, scale):
    out = _fused_attention_fwd_impl(q, k, v, rel_bias, mask, scale)
    return out, (q, k, v, rel_bias, mask)


def _fused_attention_bwd(scale, residuals, g):
    """Recompute-based backward in plain XLA (cheap vs storing probs)."""
    q, k, v, rel_bias, mask = residuals

    def fwd(q, k, v, rel_bias):
        return _attention_xla(q, k, v, rel_bias, mask, scale)

    _, vjp = jax.vjp(fwd, q, k, v, rel_bias)
    dq, dk, dv, dbias = vjp(g)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, dbias, dmask


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_window_attention_qkhd(q, k, v, rel_bias, mask=None, scale: float = 1.0):
    """Fused softmax(q k^T scale + bias [+ mask]) v.

    @param q, k, v: [nWB, nH, L, hd]
    @param rel_bias: [nH, L, L] relative-position bias
    @param mask: [nW, L, L] additive shifted-window mask or None
    @return [nWB, nH, L, hd]
    """
    if mask is not None and (mask.shape[0] > q.shape[0]):
        mask = mask[: q.shape[0]]
    return _fused_attention(q, k, v, rel_bias, mask, float(scale))


