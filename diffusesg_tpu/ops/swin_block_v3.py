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


def _plan_v3(b, h, w, c, window, num_heads, mlp_hidden, has_mask=True):
    """(rb, rp, P, G, fuse_mlp) for the pair-packed kernel.

    rb: batch elements per tile, rp: window-rows per tile, P: windows packed
    along the matmul M dim (2 when the per-tile window count is even).

    ``has_mask``: whether this block is a SHIFTED-window block — only those
    carry the additive mask tile into VMEM (fwd call site: `mask is not
    None`).  Defaults to True (conservative) for external callers.
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
        # the shifted-window mask tile ((rp*n_win/P, P*L, G*P*L) fp32),
        # counted EXACTLY and only when this block actually carries one
        # (shift > 0).  Exact per-plan accounting replaces the round-3
        # 4 MB-allowance heuristic: at the 14M cap every chip-validated
        # VG/COCO plan is unchanged (the real mask tiles are 1-2 MB and the
        # conservative act coefficient's headroom covers them), while an
        # unseen geometry with an outsized mask now shrinks its tile instead
        # of tripping a Mosaic VMEM error — and unshifted blocks no longer
        # pay for a mask they never load.
        maskp = ((rp * n_win // max(P, 1)) * (P * L) * (G * P * L) * 4
                 if has_mask else 0)
        return weights + act + hid + relp + scores + hmask + maskp

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
            y_ref=None, *, window, num_heads, n_win, rb, rp, P, G):
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
            # PER-HEAD row max: with a global row max, a head whose whole
            # score block sits >87 below the max underflows to exp=0 and its
            # denominator vanishes (observed as a mid-training NaN at
            # extreme sigma); per-head maxes guarantee den >= 1
            m_cols = [jnp.max(s[:, g * P * L:(g + 1) * P * L], axis=-1,
                              keepdims=True) for g in range(G)]
            mrow = (jnp.concatenate(
                [jnp.broadcast_to(m, (P * L, P * L)) for m in m_cols],
                axis=-1) if G > 1
                else jnp.broadcast_to(m_cols[0], (P * L, P * L)))
            ef = jnp.exp(s - mrow)
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
            grp_outs.append((num / den).astype(x.dtype))
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

    if y_ref is not None:  # save the attn-half output for the backward pass
        y_ref[:] = y.reshape(rb, rp * window, wdim, c).astype(y_ref.dtype)

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
              num_heads, window, save_y=False):
    b, h, w, c = x.shape
    if jax.default_backend() != "tpu" and not INTERPRET:
        from .swin_block_kernel import swin_attn_block_xla
        from .mlp_block_kernel import mlp_block_xla
        y = swin_attn_block_xla(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv,
                                wproj, bproj, rel_bias, mask,
                                num_heads=num_heads, window=window)
        out = mlp_block_xla(y.reshape(b, h * w, c), ln2_g, ln2_b, w1, b1,
                            w2, b2).reshape(b, h, w, c)
        return (out, y) if save_y else out
    n_win = w // window
    L = window * window
    hd = c // num_heads
    hidden = w1.shape[1]
    rb, rp, P, G, fuse_mlp = _plan_v3(b, h, w, c, window, num_heads, hidden,
                                      has_mask=mask is not None)
    n_grp = num_heads // G
    if (P * L) % 8 != 0:
        # Score-row sublane alignment, mirroring the backward's geom_ok:
        # P=1 at window 10 (L=100) puts window boundaries at
        # non-multiple-of-8 sublane offsets.  Reachable only with an odd
        # batch at a full-grid stage (n_win=1, rb stuck at 1) — a rare
        # path, so take the always-legal XLA composition rather than
        # depend on Mosaic accepting unaligned concat offsets per shape
        # (the backward kernels reject this geometry outright).
        from .swin_block_kernel import swin_attn_block_xla
        from .mlp_block_kernel import mlp_block_xla
        y = swin_attn_block_xla(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv,
                                wproj, bproj, rel_bias, mask,
                                num_heads=num_heads, window=window)
        out = mlp_block_xla(y.reshape(b, h * w, c), ln2_g, ln2_b, w1, b1,
                            w2, b2).reshape(b, h, w, c)
        return (out, y) if save_y else out
    if mask is not None and (rp * n_win) % P != 0:
        # shifted-window pairs must not straddle tile boundaries
        out = fused_swin_block_v2(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv,
                                  wproj, bproj, rel_bias, mask, ln2_g, ln2_b,
                                  w1, b1, w2, b2, num_heads, window)
        return (out, None) if save_y else out
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

    dual_out = save_y and fuse_mlp

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
        yr = refs[idx + 1] if dual_out else None
        _kernel(xr, ssr, wqr, bqr, wpr, bpr, rgr, hmr, mr, mlp_refs,
                refs[idx], yr, window=window, num_heads=num_heads,
                n_win=n_win, rb=rb, rp=rp, P=P, G=G)

    flops = (b * h * w * c * 4 * c * 2
             + (b * h * w * c * hidden * 4 if fuse_mlp else 0)
             + b * (h * w // L // P) * n_grp
             * 3 * (P * L) * (G * P * L) * (G * hd) * 2)
    ospec = pl.BlockSpec((rb, rp * window, w, c), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct(x.shape, x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[ospec, ospec] if dual_out else ospec,
        out_shape=[oshape, oshape] if dual_out else oshape,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * h * w * (G * L + (hidden if fuse_mlp else 0))),
        interpret=INTERPRET,
    )(*args)
    if dual_out:
        out, y = out
        return out, y
    if not fuse_mlp:
        from .mlp_block_kernel import fused_mlp_block
        y = out
        out = fused_mlp_block(y.reshape(b, h * w, c), ln2_g, ln2_b,
                              w1, b1, w2, b2).reshape(b, h, w, c)
        if save_y:
            return out, y
    return out


def _silu_grad(p):
    s = jax.nn.sigmoid(p)
    return s * (1.0 + p * (1.0 - s))


def _attn_bwd_kernel(x_ref, ss_ref, g1_ref, b1n_ref, wqkv_ref, bqkv_ref,
                     wproj_ref, relp_ref, hm_ref, mask_ref, dy_ref,
                     dx_ref, dss_ref, dg1_ref, db1_ref, dwq_ref, dbq_ref,
                     dwp_ref, dbp_ref, drelp_ref,
                     *, window, num_heads, n_win, rb, rp, P, G,
                     export_wq=False, eps=1e-6):
    """Analytic backward of the attention half:
    y = a + proj(attention(qkv(LN(a)))) with a = silu(affine(x)).

    Recomputes the forward in-VMEM (flash-attention-style) and accumulates
    weight/LN/rel-bias grads into constant-index output blocks.  In
    export_wq mode (wide channels: the fp32 dWqkv accumulator alone is
    7MB at c=768), dwq_ref/dbq_ref are instead per-tile EXPORTS of dqkv
    and hn_w; the caller runs the dWqkv dot in XLA."""
    c = x_ref.shape[-1]
    wdim = x_ref.shape[2]
    L = window * window
    T = rp * window * wdim
    Tt = rb * T
    nh, hd = num_heads, c // num_heads
    n_grp = nh // G
    att_scale = hd ** -0.5
    nw_t = rb * rp * n_win
    dt = x_ref.dtype

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    acc_refs = ((dg1_ref, db1_ref, dwp_ref, dbp_ref, drelp_ref)
                if export_wq else
                (dg1_ref, db1_ref, dwq_ref, dbq_ref, dwp_ref, dbp_ref,
                 drelp_ref))

    @pl.when(first)
    def _init():
        for ref in acc_refs:
            ref[:] = jnp.zeros_like(ref)

    @pl.when(pl.program_id(1) == 0)
    def _init_ss():
        dss_ref[:] = jnp.zeros_like(dss_ref)

    def to_w(t2d):
        k = t2d.shape[-1]
        return (t2d.reshape(rb * rp, window, n_win, window, k)
                .transpose(0, 2, 1, 3, 4).reshape(Tt, k))

    def from_w(t2d):
        k = t2d.shape[-1]
        return (t2d.reshape(rb * rp, n_win, window, window, k)
                .transpose(0, 2, 1, 3, 4).reshape(Tt, k))

    x = x_ref[:]
    # ---- forward recompute (with EXPLICIT gamma/beta, not folded) ----
    pre_parts, a_parts = [], []
    for rbi in range(rb):
        ss = ss_ref[rbi, 0].astype(jnp.float32)
        xi = x[rbi].astype(jnp.float32)
        pre = (ss[c:] + xi * (ss[:c] + 1.0)).reshape(T, c)
        pre_parts.append(pre)
        a_parts.append(jax.nn.silu(pre))
    a = jnp.concatenate(a_parts, axis=0) if rb > 1 else a_parts[0]
    mean = jnp.mean(a, axis=-1, keepdims=True)
    var = jnp.mean((a - mean) ** 2, axis=-1, keepdims=True)
    r_ = jax.lax.rsqrt(var + eps)
    hbar = (a - mean) * r_
    gam = g1_ref[0].astype(jnp.float32)
    hn = (hbar * gam + b1n_ref[0].astype(jnp.float32)).astype(dt)
    hn_w = to_w(hn) if n_win > 1 else hn
    qkv = jnp.dot(hn_w, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv_w = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(dt)
    hm = hm_ref[:]

    dy_parts = []
    for rbi in range(rb):
        dy_parts.append(dy_ref[rbi].astype(jnp.float32).reshape(T, c))
    dyf = jnp.concatenate(dy_parts, axis=0) if rb > 1 else dy_parts[0]
    dyb = dyf.astype(dt)
    dattn = jax.lax.dot_general(  # dy @ Wp^T
        dyb, wproj_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dattn_w = (to_w(dattn.astype(dt)) if n_win > 1
               else dattn.astype(dt))  # [Tt, C] bf16, window order

    attn_parts, dqkv_parts = [], []
    for pi in range(nw_t // P):
        blk = qkv_w[pi * P * L:(pi + 1) * P * L]
        dO_blk = dattn_w[pi * P * L:(pi + 1) * P * L].astype(jnp.float32)
        o_grp, dq_grp, dk_grp, dv_grp = [], [], [], []
        for gg in range(n_grp):
            o0 = gg * G * hd
            q = (blk[:, o0:o0 + G * hd].astype(jnp.float32)
                 * att_scale).astype(dt)
            k = blk[:, c + o0:c + o0 + G * hd]
            v = blk[:, 2 * c + o0:2 * c + o0 + G * hd]
            kcat = jnp.concatenate([k] * G, axis=0) if G > 1 else k
            vcat = jnp.concatenate([v] * G, axis=0) if G > 1 else v
            khat = kcat * hm
            vhat = vcat * hm
            s = jax.lax.dot_general(
                q, khat, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + relp_ref[gg]
            if mask_ref is not None:
                s = s + mask_ref[pi % (rp * n_win // P)]
            # per-head max (see forward kernel: guarantees den >= 1, no
            # underflow-driven NaN in the divisions below)
            m_cols = [jnp.max(s[:, g * P * L:(g + 1) * P * L], axis=-1,
                              keepdims=True) for g in range(G)]
            mrow = (jnp.concatenate(
                [jnp.broadcast_to(m, (P * L, P * L)) for m in m_cols],
                axis=-1) if G > 1
                else jnp.broadcast_to(m_cols[0], (P * L, P * L)))
            ef = jnp.exp(s - mrow)
            e = ef.astype(dt)
            num = jax.lax.dot_general(
                e, vhat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            den_cols = [jnp.sum(ef[:, g * P * L:(g + 1) * P * L], axis=-1,
                                keepdims=True) for g in range(G)]
            den = jnp.concatenate(
                [jnp.broadcast_to(d, (P * L, hd)) for d in den_cols],
                axis=-1) if G > 1 else jnp.broadcast_to(den_cols[0],
                                                        (P * L, hd))
            O = num / den
            o_grp.append(O.astype(dt))

            dO = dO_blk[:, o0:o0 + G * hd]
            dnum = (dO / den)
            dnumb = dnum.astype(dt)
            # dden per head: -sum_d(dO * O) / den  (hd-wide, same per lane)
            dden_g = [
                -jnp.sum((dO * O)[:, g * hd:(g + 1) * hd], axis=-1,
                         keepdims=True)
                / den_cols[g] for g in range(G)]
            de = jax.lax.dot_general(  # dnum @ Vhat^T
                dnumb, vhat, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dden_cols = jnp.concatenate(
                [jnp.broadcast_to(dden_g[g], (P * L, P * L))
                 for g in range(G)], axis=-1) if G > 1 else \
                jnp.broadcast_to(dden_g[0], (P * L, P * L))
            dS = ef * (de + dden_cols)
            drelp_ref[gg] += dS
            dSb = dS.astype(dt)
            dqs = jax.lax.dot_general(  # dS @ Khat
                dSb, khat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dkhat = jax.lax.dot_general(  # dS^T @ q
                dSb, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [G*P*L, G*hd]
            dvhat = jax.lax.dot_general(  # e^T @ dnum
                e, dnumb, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_grp.append(dqs * att_scale)
            dk_grp.append(jnp.concatenate(
                [dkhat[g * P * L:(g + 1) * P * L, g * hd:(g + 1) * hd]
                 for g in range(G)], axis=-1) if G > 1
                else dkhat[:, :hd])
            dv_grp.append(jnp.concatenate(
                [dvhat[g * P * L:(g + 1) * P * L, g * hd:(g + 1) * hd]
                 for g in range(G)], axis=-1) if G > 1
                else dvhat[:, :hd])
        attn_parts.append(jnp.concatenate(o_grp, axis=-1)
                          if n_grp > 1 else o_grp[0])
        dqkv_parts.append(jnp.concatenate(dq_grp + dk_grp + dv_grp, axis=-1))
    attn_w = (jnp.concatenate(attn_parts, axis=0)
              if len(attn_parts) > 1 else attn_parts[0])  # [Tt, C] bf16
    dqkv = (jnp.concatenate(dqkv_parts, axis=0)
            if len(dqkv_parts) > 1 else dqkv_parts[0])  # [Tt, 3C] fp32

    attn = from_w(attn_w) if n_win > 1 else attn_w
    dwp_ref[:] += jax.lax.dot_general(  # attn^T @ dy
        attn, dyb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbp_ref[:] += jnp.sum(dyf, axis=0, keepdims=True)

    dqkvb = dqkv.astype(dt)
    if export_wq:
        dwq_ref[:] = dqkvb   # [Tt, 3C] per-tile export (window token order)
        dbq_ref[:] = hn_w    # [Tt, C] export; order cancels in the dot
    else:
        dwq_ref[:] += jax.lax.dot_general(  # hn_w^T @ dqkv
            hn_w, dqkvb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbq_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)
    dhn_w = jax.lax.dot_general(  # dqkv @ Wq^T
        dqkvb, wqkv_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dhn = from_w(dhn_w.astype(jnp.float32)) if n_win > 1 else dhn_w
    dg1_ref[:] += jnp.sum(dhn * hbar, axis=0, keepdims=True)
    db1_ref[:] += jnp.sum(dhn, axis=0, keepdims=True)
    dh = dhn * gam
    da = dyf + r_ * (dh - jnp.mean(dh, axis=-1, keepdims=True)
                     - hbar * jnp.mean(dh * hbar, axis=-1, keepdims=True))

    dx_parts, dss_rows = [], []
    for rbi in range(rb):
        ss = ss_ref[rbi, 0].astype(jnp.float32)
        xi = x[rbi].astype(jnp.float32).reshape(T, c)
        pre = pre_parts[rbi]
        dpre = da[rbi * T:(rbi + 1) * T] * _silu_grad(pre)
        dx_parts.append((dpre * (ss[:c] + 1.0)).reshape(rp * window, wdim, c))
        dscale = jnp.sum(dpre * xi, axis=0, keepdims=True)
        dshift = jnp.sum(dpre, axis=0, keepdims=True)
        dss_rows.append(jnp.concatenate([dscale, dshift], axis=-1))  # [1, 2C]
    dx_ref[:] = (jnp.stack(dx_parts, axis=0)
                 if rb > 1 else dx_parts[0][None]).astype(dx_ref.dtype)
    dss_ref[:] += (jnp.stack(dss_rows, axis=0)
                   if rb > 1 else dss_rows[0][None])


def _pad_lane(n):
    return -(-n // 128) * 128


def _attn_bwd_fits(c, Tt, P, L, G, n_grp, export):
    """Scoped-VMEM estimate with Mosaic tiling PADDING: lane (last) dims
    round up to 128, score sublanes to 8.  The unpadded model undercounted
    COCO's c=96 / L=100 stages by ~45% (real 17.7M vs 11.2M estimated) and
    tripped the 16M scoped limit at compile; coefficients calibrated so the
    40x40 failure reproduces and all measured-good VG tilings keep fitting."""
    cp = _pad_lane(c)
    c3p = _pad_lane(3 * c)
    sl = _pad_lane(G * P * L)
    sr = -(-(P * L) // 8) * 8
    acc = c * cp * 4 + n_grp * sr * sl * 4 \
        + (0 if export else c * c3p * 4)
    act = Tt * (cp * 44 + c3p * 10)  # a/hbar/hn/dy fp32 + qkv/dqkv copies
    act += Tt * (c3p + cp) * 2 if export else 0  # dqkv + hn_w export tiles
    pair = sr * sl * 16  # s/ef/dS/de transients
    # the estimate underpredicts real scoped usage by ~15% (measured on the
    # COCO 40x40 OOM); export mode streams its big tensors so its true
    # footprint tracks the estimate closer — give it a slightly looser cap
    cap = 13.2 if export else 13.0
    return acc + act + pair <= int(cap * 1024 * 1024)


def _attn_bwd_call(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj,
                   rel_bias, mask, dy, num_heads, window):
    """Pallas attention-half backward.  Returns grads or None (no fit)."""
    b, h, w, c = x.shape
    n_win = w // window
    L = window * window
    hd = c // num_heads
    rb, rp, P, G, _ = _plan_v3(b, h, w, c, window, num_heads, 4 * c,
                               has_mask=mask is not None)
    n_grp = num_heads // G

    def pick_P(rb_, rp_):
        return 2 if (rb_ * rp_ * n_win) % 2 == 0 else 1

    def geom_ok(rb_, rp_, P_):
        if (P_ * L) % 8 != 0:
            # score rows must be sublane-aligned: P=1 with L=100 (window 10)
            # puts pair boundaries at row 100 — Mosaic rejects the resulting
            # concat offsets ("offset mismatch on non-concat dimension")
            return False
        return mask is None or (rp_ * n_win) % P_ == 0

    def _search(rb0, rp0, export):
        """Largest (rb, rp) <= (rb0, rp0) that fits; None if even 1x1 fails."""
        rb_, rp_ = rb0, rp0
        while True:
            P_ = pick_P(rb_, rp_)
            Tt_ = rb_ * rp_ * window * w
            if _attn_bwd_fits(c, Tt_, P_, L, G, n_grp, export) \
                    and geom_ok(rb_, rp_, P_):
                return rb_, rp_, P_
            if rb_ > 1:
                rb_ //= 2
            elif rp_ > 1:
                rp_ //= 2
            else:
                return None

    # prefer keeping the dWqkv accumulator in VMEM (non-export), shrinking
    # the token tile if needed; only fall back to export mode (per-tile
    # dqkv/hn streaming + XLA weight-grad dot) when even a 1x1 tile's
    # accumulators don't fit (wide channels: c=768 dWqkv alone is 7MB)
    export = False
    found = _search(rb, rp, False)
    if found is None:
        export = True
        found = _search(rb, rp, True)
        if found is None:
            return None
    rb, rp, P = found
    grid = (b // rb, h // (rp * window))
    grid_r = grid[1]
    relp = _build_relp(rel_bias, L, P, G, n_grp)
    hm = jnp.asarray(_headmask(L, P, G, hd), x.dtype)
    ss3 = scale_shift.reshape(b, 1, 2 * c)
    vec = lambda v: v.reshape(1, -1)

    tile = pl.BlockSpec((rb, rp * window, w, c), lambda bi, r: (bi, r, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    cix2 = lambda bi, r: (0, 0)
    cix3 = lambda bi, r: (0, 0, 0)
    in_specs = [tile,
                pl.BlockSpec((rb, 1, 2 * c), lambda bi, r: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                full, full, full, full, full, full, full]
    args = [x, ss3, vec(ln1_g), vec(ln1_b), wqkv, vec(bqkv), wproj, relp, hm]
    has_mask = mask is not None
    if has_mask:
        maskp = _build_maskp(mask, L, P, G)
        pairs_tile = rp * n_win // P
        in_specs.append(pl.BlockSpec((pairs_tile, P * L, G * P * L),
                                     lambda bi, r: (r, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(maskp)
    in_specs.append(tile)  # dy
    args.append(dy)

    def kernel(*refs):
        xr, ssr, g1r, b1r, wqr, bqr, wpr, rgr, hmr = refs[:9]
        idx = 9
        mr = None
        if has_mask:
            mr = refs[idx]
            idx += 1
        dyr = refs[idx]
        outs = refs[idx + 1:idx + 10]
        _attn_bwd_kernel(xr, ssr, g1r, b1r, wqr, bqr, wpr, rgr, hmr, mr, dyr,
                         *outs, window=window, num_heads=num_heads,
                         n_win=n_win, rb=rb, rp=rp, P=P, G=G,
                         export_wq=export)

    f32 = jnp.float32
    Tt = rb * rp * window * w
    n_tok = b * h * w
    if export:
        wq_spec = pl.BlockSpec((Tt, 3 * c),
                               lambda bi, r: (bi * grid_r + r, 0),
                               memory_space=pltpu.VMEM)
        bq_spec = pl.BlockSpec((Tt, c),
                               lambda bi, r: (bi * grid_r + r, 0),
                               memory_space=pltpu.VMEM)
        wq_shape = jax.ShapeDtypeStruct((n_tok, 3 * c), x.dtype)
        bq_shape = jax.ShapeDtypeStruct((n_tok, c), x.dtype)
    else:
        wq_spec = pl.BlockSpec((c, 3 * c), cix2, memory_space=pltpu.VMEM)
        bq_spec = pl.BlockSpec((1, 3 * c), cix2, memory_space=pltpu.VMEM)
        wq_shape = jax.ShapeDtypeStruct((c, 3 * c), f32)
        bq_shape = jax.ShapeDtypeStruct((1, 3 * c), f32)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            tile,                                            # dx
            pl.BlockSpec((rb, 1, 2 * c), lambda bi, r: (bi, 0, 0),
                         memory_space=pltpu.VMEM),           # dss
            pl.BlockSpec((1, c), cix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), cix2, memory_space=pltpu.VMEM),
            wq_spec,
            bq_spec,
            pl.BlockSpec((c, c), cix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), cix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_grp, P * L, G * P * L), cix3,
                         memory_space=pltpu.VMEM),           # drelp
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, 1, 2 * c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            wq_shape,
            bq_shape,
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((n_grp, P * L, G * P * L), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * b * h * w * c * 4 * c * 2,
            bytes_accessed=4 * x.size * x.dtype.itemsize,
            transcendentals=b * h * w * G * L),
        interpret=INTERPRET,
    )(*args)
    dx, dss3, dg1, db1, dwq, dbq, dwp, dbp, drelp = outs
    if export:
        dqkv_all, hnw_all = dwq, dbq  # [n_tok, 3C] / [n_tok, C] bf16
        dwq = jax.lax.dot_general(hnw_all, dqkv_all,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        dbq = jnp.sum(dqkv_all.astype(f32), axis=0, keepdims=True)
    # fold drelp back to the [nH, L, L] bias layout:
    # relp[gg, p*L+i, g*P*L + p*L+j] <- rel[gg*G+g, i, j]
    drel = jnp.zeros_like(rel_bias)
    for gg in range(n_grp):
        for g in range(G):
            acc = sum(drelp[gg, p * L:(p + 1) * L,
                            g * P * L + p * L: g * P * L + (p + 1) * L]
                      for p in range(P))
            drel = drel.at[gg * G + g].set(acc.astype(rel_bias.dtype))
    # cotangent dtypes must match the primals (weights/biases may arrive
    # bf16 under a full-bf16 param policy; custom_vjp checks output avals)
    return (dx, dss3.reshape(b, 2 * c).astype(scale_shift.dtype),
            dg1[0].astype(ln1_g.dtype), db1[0].astype(ln1_b.dtype),
            dwq.astype(wqkv.dtype), dbq[0].astype(bqkv.dtype),
            dwp.astype(wproj.dtype), dbp[0], drel)  # dbp cast in _bwd (bproj not in scope here)


def _fwd(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj, rel_bias,
         mask, ln2_g, ln2_b, w1, b1, w2, b2, num_heads, window):
    out, y = _fwd_impl(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj,
                       rel_bias, mask, ln2_g, ln2_b, w1, b1, w2, b2,
                       num_heads, window, save_y=True)
    return out, (x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj,
                 rel_bias, mask, ln2_g, ln2_b, w1, b1, w2, b2, y)


def _bwd_xla(num_heads, window, residuals, g):
    (x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj, rel_bias, mask,
     ln2_g, ln2_b, w1, b1, w2, b2, _y) = residuals

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


def _bwd(num_heads, window, residuals, g):
    (x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj, rel_bias, mask,
     ln2_g, ln2_b, w1, b1, w2, b2, y) = residuals
    on_tpu = jax.default_backend() == "tpu" or INTERPRET
    if not on_tpu or y is None:
        return _bwd_xla(num_heads, window, residuals, g)

    from .mlp_block_kernel import mlp_bwd_call, mlp_block_xla
    b, h, w, c = x.shape
    n = b * h * w
    mres = mlp_bwd_call(y.reshape(n, c), ln2_g, ln2_b, w1, b1, w2,
                        g.reshape(n, c).astype(y.dtype))
    if mres is None:
        def mlp_part(yy, g2, bb2n, ww1, bbb1, ww2, bbb2):
            return mlp_block_xla(yy.reshape(b, h * w, c), g2, bb2n, ww1,
                                 bbb1, ww2, bbb2).reshape(b, h, w, c)
        _, mvjp = jax.vjp(mlp_part, y, ln2_g, ln2_b, w1, b1, w2, b2)
        dy, dg2, db2, dw1, dbb1, dw2, dbb2 = mvjp(g.astype(y.dtype))
    else:
        dy2d, dg2, db2, dw1, dbb1, dw2, dbb2 = mres
        dy = dy2d.reshape(b, h, w, c)
        dg2 = dg2.astype(ln2_g.dtype)
        db2 = db2.astype(ln2_b.dtype)
        dw1 = dw1.astype(w1.dtype)
        dbb1 = dbb1.astype(b1.dtype)
        dw2 = dw2.astype(w2.dtype)
        dbb2 = dbb2.astype(b2.dtype)

    ares = _attn_bwd_call(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj,
                          rel_bias, mask, dy, num_heads, window)
    if ares is None:
        from .swin_block_kernel import swin_attn_block_xla

        def attn_part(xx, ss, g1, bb1n, wq, bq, wp, bp, rel):
            return swin_attn_block_xla(xx, ss, g1, bb1n, wq, bq, wp, bp, rel,
                                       mask, num_heads=num_heads,
                                       window=window)
        y_p, avjp = jax.vjp(attn_part, x, scale_shift, ln1_g, ln1_b, wqkv,
                            bqkv, wproj, bproj, rel_bias)
        dx, dss, dg1, db1, dwq, dbq, dwp, dbp, drel = avjp(
            dy.astype(y_p.dtype))
    else:
        dx, dss, dg1, db1, dwq, dbq, dwp, dbp, drel = ares
        dbp = dbp.astype(bproj.dtype)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (dx, dss, dg1, db1, dwq, dbq, dwp, dbp, drel, dmask, dg2, db2,
            dw1, dbb1, dw2, dbb2)


fused_swin_block_v3.defvjp(_fwd, _bwd)
