"""Fully-fused Swin block Pallas TPU kernel, v3: pair-packed window attention.

Same coverage as ops/swin_full_block.py — one kernel pass per
SwinTransformerBlock (reference: DiffuseSG/model/diffusesg/diffusesg.py:232-275):

    a   = silu(shift + x * (scale + 1))
    y   = a + proj(window_attention(qkv(LN1(a))))
    out = y + fc2(gelu(fc1(LN2(y))))        # fused when VMEM fits

v3 redesigns the attention inner loop around Mosaic's real cost model, where
per-op issue overhead (not FLOPs) dominated v2's 4.9 ms 64x64 stage:

* Window-contiguous reorder once per tile.  The raster tile
  [rp*window, W, C] is transposed to window-major token order with ONE
  5-D transpose, so each window's L tokens are a contiguous sublane slice —
  v2 sliced/reshaped [window, window, 3C] sub-blocks per window (2 ops x
  4096 windows at the 64x64 stage).

* Pair M-packing.  P=2 windows are stacked along the matmul M dim, filling
  the MXU's 128 output rows (L=64 alone wastes half of every pass).  The
  cross-window score quadrants are garbage; a -1e9 additive bias kills them
  in the softmax.  Halves the iteration count on top of doubling MXU use.

* Tile-and-mask block-diagonal K/V.  Khat/Vhat ([G*P*L, G*hd], head g's
  K/V on the g-th diagonal block) are built with ONE sublane concat + ONE
  multiply by a constant 0/1 mask — v2 scatter-stored 2G sub-tiles into
  zeroed VMEM scratch per window (8 serialized stores x 4096 windows).

* Matmul-normalized softmax.  Per (pair, head-group): one row-max over ALL
  G*P*L columns (a per-row constant cancels in softmax, so one max replaces
  G per-head maxes), one exp, then BOTH the attention numerator and the
  per-head denominator come from the MXU: num = e @ Vhat and
  den = e @ headmask (the same 0/1 block-diag mask sums each head's L
  columns, broadcast across that head's hd lanes), finishing with a single
  divide.  v2 ran 6 VPU ops per head slice.

Backward: custom_vjp recomputing with the plain XLA composition, same as v2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .swin_full_block import swin_block_xla, _head_group, _layer_norm
from .swin_full_block import fused_swin_block as fused_swin_block_v2

INTERPRET = False  # tests flip this to run the Pallas kernel on CPU (interpret)

NEG = -1e9


def _plan_v3(b, h, w, c, window, num_heads, mlp_hidden):
    """(rb, rp, P, G, fuse_mlp) for the pair-packed kernel.

    rb: batch elements per tile, rp: window-rows per tile, P: windows packed
    along the matmul M dim (2 when the per-tile window count is even).
    """
    n_win = w // window
    rows_img = h // window
    L = window * window
    G = _head_group(num_heads, c // num_heads)
    n_grp = num_heads // G

    def est_bytes(rb, rp, fuse):
        T = rb * rp * window * w
        weights = (3 * c * c + c * c) * 2 + (2 * c * mlp_hidden * 2 if fuse else 0)
        act = T * c * 44  # x/a/hn/qkv(x2 layouts)/attn(x2)/y incl. fp32 transients
        hid = T * mlp_hidden * 8 if fuse else 0
        P = 2 if (rb * rp * n_win) % 2 == 0 else 1
        relp = n_grp * (P * L) * (G * P * L) * 4
        scores = (P * L) * (G * P * L) * 8  # fp32 scores + exp
        hmask = (G * P * L) * (G * c // num_heads) * 2
        return weights + act + hid + relp + scores + hmask

    LIMIT = 14 * 1024 * 1024

    # grow the tile: window-rows first (bigger contiguous matmuls), then batch
    rb, rp = 1, 1
    fuse = est_bytes(1, 1, True) <= LIMIT
    while (rp * 2 <= rows_img and rows_img % (rp * 2) == 0
           and est_bytes(rb, rp * 2, fuse) <= LIMIT
           and rb * (rp * 2) * window * w <= 4096):
        rp *= 2
    while (rb * 2 <= b and b % (rb * 2) == 0
           and est_bytes(rb * 2, rp, fuse) <= LIMIT
           and (rb * 2) * rp * window * w <= 4096):
        rb *= 2
    P = 2 if (rb * rp * n_win) % 2 == 0 else 1
    return rb, rp, P, G, fuse


def _build_relp(rel_bias, L, P, G, n_grp):
    """[n_grp, P*L, G*P*L] additive bias: rel bias on the (window, head)
    diagonal blocks, -1e9 on cross-window quadrants."""
    eye = jnp.eye(P, dtype=rel_bias.dtype)
    off = NEG * (1.0 - jnp.kron(eye, jnp.ones((L, L), rel_bias.dtype)))
    rows = []
    for gg in range(n_grp):
        cols = [jnp.kron(eye, rel_bias[gg * G + g]) + off for g in range(G)]
        rows.append(jnp.concatenate(cols, axis=-1)[None])
    return jnp.concatenate(rows, axis=0).astype(jnp.float32)


def _build_maskp(mask, L, P, G):
    """[nW/P, P*L, G*P*L] shifted-window additive mask in pair layout."""
    nw = mask.shape[0]
    m = mask.reshape(nw // P, P, L, L)
    blocks = []
    for p in range(P):
        pad = [(0, 0), (p * L, (P - 1 - p) * L), (p * L, (P - 1 - p) * L)]
        blocks.append(jnp.pad(m[:, p], pad))
    core = sum(blocks)  # [nW/P, P*L, P*L] block-diag per pair
    return jnp.tile(core, (1, 1, G)).astype(jnp.float32)


def _headmask(L, P, G, hd) -> np.ndarray:
    """Constant 0/1 block-diag builder [G*P*L, G*hd]: row block g x col
    block g is ones.  Doubles as the softmax-denominator summer."""
    m = np.zeros((G * P * L, G * hd), np.float32)
    for g in range(G):
        m[g * P * L:(g + 1) * P * L, g * hd:(g + 1) * hd] = 1.0
    return m


def _norm_nogb(x, eps=1e-6):
    """LayerNorm WITHOUT gamma/beta: those are folded into the next matmul's
    weights host-side (w_eff = gamma[:,None]*W, b_eff = b + beta@W)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _kernel(x_ref, ss_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, relp_ref, hm_ref, mask_ref, mlp_refs, o_ref,
            *, window, num_heads, n_win, rb, rp, P, G):
    c = x_ref.shape[-1]
    wdim = x_ref.shape[2]
    L = window * window
    T = rp * window * wdim  # tokens per batch element in this tile
    Tt = rb * T
    nh, hd = num_heads, c // num_heads
    n_grp = nh // G
    att_scale = hd ** -0.5
    nw_t = rb * rp * n_win  # windows in this tile
    x = x_ref[:]

    # noise affine per packed batch element (leading-dim indexing only)
    a_parts = []
    for rbi in range(rb):
        ss = ss_ref[rbi, 0].astype(jnp.float32)
        xi = x[rbi].astype(jnp.float32)
        a_parts.append(jax.nn.silu(ss[c:] + xi * (ss[:c] + 1.0)).reshape(T, c))
    a = jnp.concatenate(a_parts, axis=0) if rb > 1 else a_parts[0]  # [Tt, C]
    hn = _norm_nogb(a).astype(x.dtype)

    # transpose to window-major token order BEFORE qkv (96 bf16 lanes moved
    # instead of 288); the matmul is per-token, so order commutes with it
    if n_win > 1:
        hn = (hn.reshape(rb * rp, window, n_win, window, c)
              .transpose(0, 2, 1, 3, 4).reshape(Tt, c))
    qkv = jnp.dot(hn, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv_w = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    hm = hm_ref[:]  # [G*P*L, G*hd] 0/1
    attn_parts = []
    for pi in range(nw_t // P):
        blk = qkv_w[pi * P * L:(pi + 1) * P * L]  # [P*L, 3C]
        grp_outs = []
        for gg in range(n_grp):
            o0 = gg * G * hd
            q = (blk[:, o0:o0 + G * hd].astype(jnp.float32)
                 * att_scale).astype(x.dtype)
            k = blk[:, c + o0:c + o0 + G * hd]
            v = blk[:, 2 * c + o0:2 * c + o0 + G * hd]
            kcat = jnp.concatenate([k] * G, axis=0) if G > 1 else k
            vcat = jnp.concatenate([v] * G, axis=0) if G > 1 else v
            khat = kcat * hm  # hm arrives pre-cast to x.dtype
            vhat = vcat * hm
            s = jax.lax.dot_general(
                q, khat, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [P*L, G*P*L]
            s = s + relp_ref[gg]
            if mask_ref is not None:
                s = s + mask_ref[pi % (rp * n_win // P)]
            # one per-row max over ALL columns: a per-row constant shift is
            # softmax-invariant within each head's own normalization slice
            ef = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            e = ef.astype(x.dtype)
            num = jax.lax.dot_general(
                e, vhat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [P*L, G*hd]
            # denominator on the VPU (overlaps the MXU): an e @ headmask
            # matmul would stream the full G*P*L contraction again (~2x the
            # attention's MXU busy cycles at G=6)
            den_parts = [
                jnp.broadcast_to(
                    jnp.sum(ef[:, g * P * L:(g + 1) * P * L], axis=-1,
                            keepdims=True), (P * L, hd))
                for g in range(G)]
            den = (jnp.concatenate(den_parts, axis=-1)
                   if G > 1 else den_parts[0])  # [P*L, G*hd]
            # floor: if one head's whole score block sits >87 below the
            # global row max, its fp32 exps underflow to 0; the floor turns
            # the resulting 0/0 into 0 instead of NaN (the per-head-max v2
            # kernel and the XLA path remain the numerically exact baseline)
            grp_outs.append((num / jnp.maximum(den, 1e-30)).astype(x.dtype))
        attn_parts.append(jnp.concatenate(grp_outs, axis=-1)
                          if n_grp > 1 else grp_outs[0])  # [P*L, C] bf16
    attn_w = (jnp.concatenate(attn_parts, axis=0)
              if len(attn_parts) > 1 else attn_parts[0])  # [Tt, C]

    if n_win > 1:  # back to raster order (proj is pointwise-per-token)
        attn = (attn_w.reshape(rb * rp, n_win, window, window, c)
                .transpose(0, 2, 1, 3, 4).reshape(Tt, c))
    else:
        attn = attn_w
    proj = jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32)
    y = a + proj + bproj_ref[0].astype(jnp.float32)

    if mlp_refs is not None:
        w1_ref, bb1_ref, w2_ref, bb2_ref = mlp_refs
        hn2 = _norm_nogb(y)
        hmid = jnp.dot(hn2.astype(x.dtype), w1_ref[:],
                       preferred_element_type=jnp.float32)
        hmid = hmid + bb1_ref[0].astype(jnp.float32)
        # tanh GELU: Mosaic has no erf (max dev ~3e-3, below bf16 resolution)
        hmid = jax.nn.gelu(hmid, approximate=True).astype(x.dtype)
        out2 = jnp.dot(hmid, w2_ref[:], preferred_element_type=jnp.float32)
        y = y + out2 + bb2_ref[0].astype(jnp.float32)

    o_ref[:] = y.reshape(rb, rp * window, wdim, c).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17))
def fused_swin_block_v3(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj,
                        bproj, rel_bias, mask, ln2_g, ln2_b, w1, b1, w2, b2,
                        num_heads, window):
    """Whole Swin block as one Pallas kernel (pair-packed attention).

    Same contract as ops/swin_full_block.fused_swin_block:
    @param x: [B, H, W, C] (already cyclically rolled if shifted window)
    @param rel_bias: [nH, L, L];  @param mask: [nW, L, L] additive or None
    """
    return _fwd_impl(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj,
                     rel_bias, mask, ln2_g, ln2_b, w1, b1, w2, b2,
                     num_heads, window)


def _fwd_impl(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj,
              rel_bias, mask, ln2_g, ln2_b, w1, b1, w2, b2,
              num_heads, window):
    if jax.default_backend() != "tpu" and not INTERPRET:
        return swin_block_xla(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj,
                              bproj, rel_bias, mask, ln2_g, ln2_b, w1, b1,
                              w2, b2, num_heads, window)
    b, h, w, c = x.shape
    n_win = w // window
    L = window * window
    hd = c // num_heads
    hidden = w1.shape[1]
    rb, rp, P, G, fuse_mlp = _plan_v3(b, h, w, c, window, num_heads, hidden)
    n_grp = num_heads // G
    if mask is not None and (rp * n_win) % P != 0:
        # shifted-window pairs must not straddle tile boundaries
        return fused_swin_block_v2(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv,
                                   wproj, bproj, rel_bias, mask, ln2_g, ln2_b,
                                   w1, b1, w2, b2, num_heads, window)
    grid = (b // rb, h // (rp * window))

    relp = _build_relp(rel_bias, L, P, G, n_grp)
    hm = jnp.asarray(_headmask(L, P, G, hd), x.dtype)
    ss3 = scale_shift.reshape(b, 1, 2 * c)
    vec = lambda v: v.reshape(1, -1)

    # fold the LN gammas/betas into the following projections (host-side):
    # LN(x; g, b) @ W == normalize(x) @ (g[:,None]*W) + b@W
    wq_eff = (wqkv.astype(jnp.float32) * ln1_g[:, None]).astype(x.dtype)
    bq_eff = bqkv + ln1_b @ wqkv.astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((rb, rp * window, w, c), lambda bi, r: (bi, r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, 1, 2 * c), lambda bi, r: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wq_eff [C, 3C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bq_eff [1, 3C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wproj [C, C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bproj [1, C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # relp [n_grp, P*L, G*P*L]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # headmask [G*P*L, G*hd]
    ]
    args = [x, ss3, wq_eff, vec(bq_eff), wproj, vec(bproj), relp, hm]

    has_mask = mask is not None
    if has_mask:
        maskp = _build_maskp(mask, L, P, G)  # [nW/P, P*L, G*P*L]
        pairs_tile = rp * n_win // P
        in_specs.append(pl.BlockSpec(
            (pairs_tile, P * L, G * P * L),
            lambda bi, r, _pt=pairs_tile: (r, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(maskp)
    if fuse_mlp:
        w1_eff = (w1.astype(jnp.float32) * ln2_g[:, None]).astype(x.dtype)
        b1_eff = b1 + ln2_b @ w1.astype(jnp.float32)
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        args += [w1_eff, vec(b1_eff), w2, vec(b2)]

    def kernel(*refs):
        xr, ssr, wqr, bqr, wpr, bpr, rgr, hmr = refs[:8]
        idx = 8
        mr = None
        if has_mask:
            mr = refs[idx]
            idx += 1
        mlp_refs = None
        if fuse_mlp:
            mlp_refs = refs[idx:idx + 4]
            idx += 4
        _kernel(xr, ssr, wqr, bqr, wpr, bpr, rgr, hmr, mr, mlp_refs,
                refs[idx], window=window, num_heads=num_heads,
                n_win=n_win, rb=rb, rp=rp, P=P, G=G)

    flops = (b * h * w * c * 4 * c * 2
             + (b * h * w * c * hidden * 4 if fuse_mlp else 0)
             + b * (h * w // L // P) * n_grp
             * 3 * (P * L) * (G * P * L) * (G * hd) * 2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, rp * window, w, c),
                               lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * h * w * (G * L + (hidden if fuse_mlp else 0))),
        interpret=INTERPRET,
    )(*args)
    if not fuse_mlp:
        from .mlp_block_kernel import fused_mlp_block
        out = fused_mlp_block(out.reshape(b, h * w, c), ln2_g, ln2_b,
                              w1, b1, w2, b2).reshape(b, h, w, c)
    return out


def _fwd(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj, rel_bias,
         mask, ln2_g, ln2_b, w1, b1, w2, b2, num_heads, window):
    out = _fwd_impl(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj,
                    rel_bias, mask, ln2_g, ln2_b, w1, b1, w2, b2,
                    num_heads, window)
    return out, (x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj,
                 rel_bias, mask, ln2_g, ln2_b, w1, b1, w2, b2)


def _bwd(num_heads, window, residuals, g):
    (x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj, rel_bias, mask,
     ln2_g, ln2_b, w1, b1, w2, b2) = residuals

    def fwd(xx, ss, g1, bb1n, wq, bq, wp, bp, rel, g2, bb2n, ww1, bbb1, ww2,
            bbb2):
        return swin_block_xla(xx, ss, g1, bb1n, wq, bq, wp, bp, rel, mask,
                              g2, bb2n, ww1, bbb1, ww2, bbb2,
                              num_heads, window)

    _, vjp = jax.vjp(fwd, x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj,
                     bproj, rel_bias, ln2_g, ln2_b, w1, b1, w2, b2)
    (dx, dss, dg1, db1, dwq, dbq, dwp, dbp, drel, dg2, db2, dw1, dbb1, dw2,
     dbb2) = vjp(g)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (dx, dss, dg1, db1, dwq, dbq, dwp, dbp, drel, dmask, dg2, db2,
            dw1, dbb1, dw2, dbb2)


fused_swin_block_v3.defvjp(_fwd, _bwd)
