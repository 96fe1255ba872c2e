"""Fully-fused Swin attention half-block Pallas TPU kernel.

Covers the attention half of a SwinTransformerBlock
(reference: DiffuseSG/model/diffusesg/diffusesg.py:232-272):

    a   = silu(shift + x * (scale + 1))        # per-block noise affine
    h   = LayerNorm(a)
    out = a + proj(window_attention(qkv(h)))   # residual

in ONE kernel pass.  Why: profiling the XLA path shows ~31% of forward time
in pure copies/reshapes from window partition/reverse transposes plus
LayerNorm convert-reduces.  Here the grid walks (batch, window-row) tiles of
the SPATIAL [B, H, W, C] layout — the window partition becomes the BlockSpec
index map (a strided DMA), scores/probs stay in VMEM, and qkv/proj weights
are VMEM-resident.  HBM traffic per block drops to one read + one write of x.

The cyclic shift of SW-MSA stays outside (one jnp.roll each way): the affine,
LN, attention-within-window and residual all commute with the roll.

Backward: custom_vjp recomputing with the plain XLA ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


INTERPRET = False  # tests flip this to run the Pallas kernel on CPU (interpret)


from .mlp_block_kernel import _layer_norm  # one canonical LN for all kernels


def swin_attn_block_xla(x, scale_shift, ln_gamma, ln_beta, wqkv, bqkv,
                        wproj, bproj, rel_bias, mask, num_heads, window):
    """Reference XLA implementation (used for backward + CPU fallback).

    @param x: [B, H, W, C] spatial activations (already rolled if shifted)
    @param scale_shift: [B, 2C] noise-affine parameters (scale | shift)
    @param rel_bias: [nH, L, L]; mask: [nW, L, L] or None
    """
    b, h, w, c = x.shape
    scale, shift = jnp.split(scale_shift[:, None, None, :], 2, axis=-1)
    a = jax.nn.silu(shift + x * (scale + 1.0))
    hn = _layer_norm(a.astype(jnp.float32), ln_gamma, ln_beta).astype(x.dtype)

    # window partition
    L = window * window
    hw = h // window
    ww = w // window
    xw = hn.reshape(b, hw, window, ww, window, c).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(-1, L, c)
    qkv = xw @ wqkv + bqkv  # [nWB, L, 3C]
    nh = num_heads
    hd = c // nh
    qkv = qkv.reshape(-1, L, 3, nh, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    att_scale = hd ** -0.5
    scores = jnp.einsum("blhd,bmhd->bhlm", q * att_scale, k,
                        preferred_element_type=jnp.float32)
    scores = scores + rel_bias[None].astype(jnp.float32)
    if mask is not None:
        nwb = scores.shape[0]
        nw = mask.shape[0]
        scores = scores + jnp.tile(mask.astype(jnp.float32)[:, None],
                                   (nwb // nw, 1, 1, 1))
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(-1, L, c)
    out = out @ wproj + bproj
    # window reverse
    out = out.reshape(b, hw, ww, window, window, c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, h, w, c)
    return (a + out.astype(jnp.float32)).astype(x.dtype)


def _kernel(x_ref, ss_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, relb_ref, mask_ref, o_ref, *, window, num_heads,
            n_win, rb):
    """One program over a [rb, window, W, C] tile: ``rb`` batch elements of
    one window-row each.  Packing batch elements per program keeps the qkv /
    proj matmuls MXU-sized when the window grid is small (COCO's 20x20 and
    10x10 stages, VG's deepest stage)."""
    c = x_ref.shape[-1]
    wdim = x_ref.shape[2]
    L = window * window
    T = window * wdim  # tokens per batch element in this tile
    nh, hd = num_heads, c // num_heads
    att_scale = hd ** -0.5

    x = x_ref[:]  # [rb, window, W, C]
    # Per-element affine: Mosaic supports int indexing of leading ref/value
    # dims and 3-D broadcasts, but NOT 4-D batched broadcasts or mixed
    # int/slice gathers — so unroll over the packed batch elements here.
    a_parts = []
    for rbi in range(rb):
        ss = ss_ref[rbi, 0].astype(jnp.float32)  # [2C]
        xi = x[rbi].astype(jnp.float32)          # [window, W, C]
        ai = jax.nn.silu(ss[c:] + xi * (ss[:c] + 1.0))
        a_parts.append(ai.reshape(T, c))
    a = jnp.concatenate(a_parts, axis=0) if rb > 1 else a_parts[0]  # [rb*T, C]
    hn = _layer_norm(a, g_ref[0].astype(jnp.float32), b_ref[0].astype(jnp.float32))

    # ONE packed qkv matmul: [rb * T, C] @ [C, 3C]
    flat = hn.astype(x.dtype)
    qkv = jnp.dot(flat, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0].astype(jnp.float32)
    qkv = qkv.reshape(rb * window, wdim, 3 * c).astype(x.dtype)

    rel = relb_ref[:].astype(jnp.float32)  # [nH, L, L]

    attn_rows = []
    for rbi in range(rb):  # static unroll over packed batch elements
        outs = []
        for wi in range(n_win):  # static unroll over windows in the row
            blk = qkv[rbi * window:(rbi + 1) * window,
                      wi * window:(wi + 1) * window, :].reshape(L, 3 * c)
            head_outs = []
            for hh in range(nh):  # static unroll over heads (lane slices:
                # Mosaic cannot reshape the lane dim into [nh, hd])
                q_h = blk[:, hh * hd:(hh + 1) * hd]
                k_h = blk[:, c + hh * hd:c + (hh + 1) * hd]
                v_h = blk[:, 2 * c + hh * hd:2 * c + (hh + 1) * hd]
                scores = jax.lax.dot_general(
                    (q_h.astype(jnp.float32) * att_scale).astype(x.dtype), k_h,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [L, L]
                scores = scores + rel[hh]
                if mask_ref is not None:
                    scores = scores + mask_ref[wi].astype(jnp.float32)
                scores = scores - jnp.max(scores, axis=-1, keepdims=True)
                p = jnp.exp(scores)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                head_outs.append(jax.lax.dot_general(
                    p.astype(x.dtype), v_h,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))  # [L, hd]
            outs.append(jnp.concatenate(head_outs, axis=-1))  # [L, C]
        row = jnp.stack(outs, axis=0).reshape(n_win, window, window, c)
        attn_rows.append(row.transpose(1, 0, 2, 3).reshape(T, c))
    attn = (jnp.concatenate(attn_rows, axis=0) if rb > 1
            else attn_rows[0])  # [rb*T, C]
    proj = jnp.dot(attn.astype(x.dtype), wproj_ref[:],
                   preferred_element_type=jnp.float32) + bproj_ref[0].astype(jnp.float32)
    out = a + proj
    o_ref[:] = out.reshape(rb, window, wdim, c).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_swin_attn_block(x, scale_shift, ln_gamma, ln_beta, wqkv, bqkv,
                          wproj, bproj, rel_bias, mask, num_heads, window):
    return _fwd_impl(x, scale_shift, ln_gamma, ln_beta, wqkv, bqkv, wproj,
                     bproj, rel_bias, mask, num_heads, window)


def _pick_batch_pack(b: int, window: int, w: int, c: int, num_heads: int,
                     n_win: int) -> int:
    """Batch elements per program.  Grow rb (power-of-2 divisor of b) until
    the packed qkv/proj matmuls reach ~1024 rows — small window grids (COCO
    20x20/10x10, VG 8x8) otherwise starve the MXU — bounded by a ~6MB VMEM
    activation budget and a static-unroll cap on the attention loops."""
    T = window * w
    rb = 1
    while (rb * 2 <= b and b % (rb * 2) == 0
           and rb * T < 1024
           and (rb * 2) * T * c * 14 <= 6 * 1024 * 1024
           and (rb * 2) * n_win * num_heads <= 384):
        rb *= 2
    return rb


def _fwd_impl(x, scale_shift, ln_gamma, ln_beta, wqkv, bqkv, wproj, bproj,
              rel_bias, mask, num_heads, window):
    if jax.default_backend() != "tpu" and not INTERPRET:
        return swin_attn_block_xla(x, scale_shift, ln_gamma, ln_beta, wqkv,
                                   bqkv, wproj, bproj, rel_bias, mask,
                                   num_heads, window)
    b, h, w, c = x.shape
    n_win = w // window
    L = window * window
    rb = _pick_batch_pack(b, window, w, c, num_heads, n_win)
    grid = (b // rb, h // window)

    # TPU tiling: vectors become [1, D] rows; scale_shift gets a unit middle
    # axis so its (sublane, lane) block dims equal the array dims
    ss3 = scale_shift.reshape(b, 1, 2 * c)
    in_specs = [
        pl.BlockSpec((rb, window, w, c), lambda bi, r: (bi, r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, 1, 2 * c), lambda bi, r: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_gamma [1, C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_beta [1, C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wqkv [C, 3C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bqkv [1, 3C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wproj [C, C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bproj [1, C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # rel_bias [nH, L, L]
    ]
    args = [x, ss3, ln_gamma.reshape(1, c), ln_beta.reshape(1, c), wqkv,
            bqkv.reshape(1, 3 * c), wproj, bproj.reshape(1, c), rel_bias]
    if mask is not None:
        # mask rows for window-row r: indices r*n_win .. r*n_win+n_win-1
        mask4 = mask.reshape(h // window, n_win, L, L)
        in_specs.append(pl.BlockSpec((1, n_win, L, L), lambda bi, r: (r, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask4)

        def kernel(x_r, ss_r, g_r, b_r, wq_r, bq_r, wp_r, bp_r, rb_r, m_r, o_r):
            _kernel(x_r, ss_r, g_r, b_r, wq_r, bq_r, wp_r, bp_r, rb_r, m_r[0],
                    o_r, window=window, num_heads=num_heads, n_win=n_win, rb=rb)
    else:
        def kernel(x_r, ss_r, g_r, b_r, wq_r, bq_r, wp_r, bp_r, rb_r, o_r):
            _kernel(x_r, ss_r, g_r, b_r, wq_r, bq_r, wp_r, bp_r, rb_r, None,
                    o_r, window=window, num_heads=num_heads, n_win=n_win, rb=rb)

    flops_est = b * h * w * c * (3 * c + c) * 2 + b * (h // window) * (w // window) * (
        2 * L * L * c) * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, window, w, c), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(flops=flops_est,
                                      bytes_accessed=2 * x.size * x.dtype.itemsize,
                                      transcendentals=b * h * w * c),
        interpret=INTERPRET,
    )(*args)


def _fwd(x, scale_shift, ln_gamma, ln_beta, wqkv, bqkv, wproj, bproj,
         rel_bias, mask, num_heads, window):
    out = _fwd_impl(x, scale_shift, ln_gamma, ln_beta, wqkv, bqkv, wproj,
                    bproj, rel_bias, mask, num_heads, window)
    return out, (x, scale_shift, ln_gamma, ln_beta, wqkv, bqkv, wproj, bproj,
                 rel_bias, mask)


def _bwd(num_heads, window, residuals, g):
    x, scale_shift, ln_gamma, ln_beta, wqkv, bqkv, wproj, bproj, rel_bias, mask = residuals

    def fwd(*diff_args):
        return swin_attn_block_xla(*diff_args, mask, num_heads, window)

    _, vjp = jax.vjp(fwd, x, scale_shift, ln_gamma, ln_beta, wqkv, bqkv,
                     wproj, bproj, rel_bias)
    grads = vjp(g)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return grads + (dmask,)


fused_swin_attn_block.defvjp(_fwd, _bwd)
