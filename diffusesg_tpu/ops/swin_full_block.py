"""Fully-fused Swin transformer block Pallas TPU kernel.

Covers an ENTIRE SwinTransformerBlock (reference:
DiffuseSG/model/diffusesg/diffusesg.py:232-275):

    a   = silu(shift + x * (scale + 1))        # per-block noise affine
    y   = a + proj(window_attention(qkv(LN1(a))))
    out = y + fc2(gelu(fc1(LN2(y))))           # MLP half fused when VMEM fits

in ONE kernel pass: one HBM read + one write of the activations per block.

Design notes (why this beats both XLA and the v1 half-block kernels):

* Multi-row tiles.  The grid walks (batch-pack, row-pack) tiles of the
  spatial [B, H, W, C] layout sized to ~1-2K tokens, so the qkv / proj /
  MLP matmuls are MXU-shaped and the per-program overhead is amortized
  (the v1 kernel ran one window-row per program: 512 programs of tiny work
  at the 64x64 stage).

* Block-diagonal head-group attention.  Window attention with L=w^2<=128
  tokens and head_dim=32 is latency-bound as per-head [L,32]x[32,L]
  matmuls (3-6% MXU).  Instead, G heads are packed into ONE pair of
  matmuls via block-diagonal operands built in VMEM scratch:

      scores[L, G*L] = Qcat[L, G*hd] . Khat[G*L, G*hd]^T(contraction=lanes)
      outcat[L, G*hd] = Pcat[L, G*L] @ Vhat[G*L, G*hd]

  where Khat/Vhat hold K_g/V_g on the g-th diagonal block and zero
  elsewhere.  The zero blocks waste G x FLOPs on the (tiny) attention term
  but raise the contraction to G*hd=96..256 lanes, i.e. ~full MXU rows —
  a large net win.  Off-diagonal score blocks are garbage-free: they are
  exactly 0 + rel/mask, and the softmax is taken per diagonal L-slice.

* Softmax per head-slice with lane-static slicing (Mosaic cannot reshape
  the lane dim), probabilities re-enter the second matmul as the SAME
  [L, G*L] concatenated layout the first matmul produced.

Backward: custom_vjp recomputing with the plain XLA ops (same pattern as
ops/swin_block_kernel.py; fused kernels are inference-hot, training
gradients flow through the XLA recompute).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp_block_kernel import _layer_norm, mlp_block_xla
from .swin_block_kernel import swin_attn_block_xla

INTERPRET = False  # tests flip this to run the Pallas kernel on CPU (interpret)


def swin_block_xla(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj,
                   rel_bias, mask, ln2_g, ln2_b, w1, b1, w2, b2,
                   num_heads, window, approximate: bool = False):
    """Reference XLA composition: attention half then MLP half.

    @param x: [B, H, W, C] spatial activations (already rolled if shifted)
    @param approximate: tanh GELU in the MLP half (mirrors the TPU kernel)
    """
    b, h, w, c = x.shape
    y = swin_attn_block_xla(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv,
                            wproj, bproj, rel_bias, mask, num_heads, window)
    y2 = mlp_block_xla(y.reshape(b, h * w, c), ln2_g, ln2_b, w1, b1, w2, b2,
                       approximate=approximate)
    return y2.reshape(b, h, w, c)


def _head_group(num_heads: int, head_dim: int) -> int:
    """Heads per block-diagonal group: largest divisor of nh with
    G*hd <= 256 lanes (2 MXU column tiles)."""
    best = 1
    for g in range(1, num_heads + 1):
        if num_heads % g == 0 and g * head_dim <= 256:
            best = g
    return best


def _plan(b: int, h: int, w: int, c: int, window: int, num_heads: int,
          mlp_hidden: int):
    """(rb, rp, G, fuse_mlp): batch-pack, window-row-pack, head group size,
    and whether the MLP half fits in the same kernel's VMEM budget."""
    n_win = w // window
    rows_img = h // window
    T1 = window * w
    G = _head_group(num_heads, c // num_heads)

    rp = 1
    while (rp * 2 <= rows_img and rows_img % (rp * 2) == 0
           and rp * 2 * T1 <= 2048):
        rp *= 2
    T = rp * T1

    def est_bytes(rb, fuse):
        weights = (3 * c * c + c * c) * 2
        if fuse:
            weights += 2 * c * mlp_hidden * 2
        # measured on-device (scoped-vmem OOM at 17.75M for an est of 10.7M
        # with the old 14-byte/elem model): count the fp32 intermediates too —
        # x in/out bf16 (4) + a/hn/y fp32 (12) + qkv fp32 then bf16 (18)
        act = rb * T * c * 34
        hid = rb * T * mlp_hidden * 8 if fuse else 0
        scr = 2 * (G * window * window) * (G * (c // num_heads)) * 2
        return weights + act + hid + scr

    # the device's scoped-vmem limit is 16M; with the calibrated estimator a
    # 14M plan cap leaves ~2M headroom for Mosaic's own staging
    LIMIT = 14 * 1024 * 1024
    fuse_mlp = est_bytes(1, True) <= LIMIT
    rb = 1
    while (rb * 2 <= b and b % (rb * 2) == 0
           and rb * 2 * T <= 2048
           and est_bytes(rb * 2, fuse_mlp) <= LIMIT
           and rb * 2 * rp * n_win * (num_heads // G) <= 48):
        rb *= 2
    return rb, rp, G, fuse_mlp


def _kernel(x_ref, ss_ref, g1_ref, b1n_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, relg_ref, mask_ref, mlp_refs, o_ref, kh_ref, vh_ref,
            *, window, num_heads, n_win, rb, rp, G):
    """One program over a [rb, rp*window, W, C] tile."""
    c = x_ref.shape[-1]
    wdim = x_ref.shape[2]
    L = window * window
    T = rp * window * wdim  # tokens per batch element in this tile
    nh, hd = num_heads, c // num_heads
    n_grp = nh // G
    att_scale = hd ** -0.5

    x = x_ref[:]  # [rb, rp*window, W, C]

    # noise affine + LN1 (per packed batch element: Mosaic handles 3-D
    # broadcasts and leading-dim int indexing, not 4-D batched broadcasts)
    a_parts = []
    for rbi in range(rb):
        ss = ss_ref[rbi, 0].astype(jnp.float32)  # [2C]
        xi = x[rbi].astype(jnp.float32)          # [rp*window, W, C]
        ai = jax.nn.silu(ss[c:] + xi * (ss[:c] + 1.0))
        a_parts.append(ai.reshape(T, c))
    a = jnp.concatenate(a_parts, axis=0) if rb > 1 else a_parts[0]  # [rb*T, C]
    hn = _layer_norm(a, g1_ref[0].astype(jnp.float32),
                     b1n_ref[0].astype(jnp.float32))

    # ONE packed qkv matmul for the whole tile
    qkv = jnp.dot(hn.astype(x.dtype), wqkv_ref[:],
                  preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)
    qkv = qkv.reshape(rb * rp * window, wdim, 3 * c)

    # zero the block-diagonal scratch once per program; only the diagonal
    # blocks are overwritten below, off-diagonal stays 0
    kh_ref[:] = jnp.zeros_like(kh_ref)
    vh_ref[:] = jnp.zeros_like(vh_ref)

    attn_parts = []
    for rbi in range(rb):
        for wr in range(rp):  # window rows in this tile
            outs = []
            row0 = (rbi * rp + wr) * window
            for wi in range(n_win):
                blk = qkv[row0:row0 + window,
                          wi * window:(wi + 1) * window, :].reshape(L, 3 * c)
                grp_outs = []
                for gg in range(n_grp):
                    o0 = gg * G * hd
                    q = (blk[:, o0:o0 + G * hd].astype(jnp.float32)
                         * att_scale).astype(x.dtype)
                    # scatter K/V head blocks onto the scratch diagonals
                    for g in range(G):
                        hoff = o0 + g * hd
                        kh_ref[g * L:(g + 1) * L, g * hd:(g + 1) * hd] = \
                            blk[:, c + hoff:c + hoff + hd]
                        vh_ref[g * L:(g + 1) * L, g * hd:(g + 1) * hd] = \
                            blk[:, 2 * c + hoff:2 * c + hoff + hd]
                    scores = jax.lax.dot_general(
                        q, kh_ref[:],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [L, G*L]
                    scores = scores + relg_ref[gg]
                    if mask_ref is not None:
                        scores = scores + mask_ref[wr, wi].astype(jnp.float32)
                    # softmax per diagonal L-slice (static lane slicing)
                    probs = []
                    for g in range(G):
                        s = scores[:, g * L:(g + 1) * L]
                        s = s - jnp.max(s, axis=-1, keepdims=True)
                        p = jnp.exp(s)
                        probs.append(p / jnp.sum(p, axis=-1, keepdims=True))
                    pcat = (jnp.concatenate(probs, axis=-1) if G > 1
                            else probs[0]).astype(x.dtype)
                    grp_outs.append(jax.lax.dot_general(
                        pcat, vh_ref[:],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))  # [L, G*hd]
                outs.append(jnp.concatenate(grp_outs, axis=-1)
                            if n_grp > 1 else grp_outs[0])  # [L, C]
            row = jnp.stack(outs, axis=0).reshape(n_win, window, window, c)
            attn_parts.append(row.transpose(1, 0, 2, 3).reshape(window * wdim, c))
    attn = (jnp.concatenate(attn_parts, axis=0) if len(attn_parts) > 1
            else attn_parts[0])  # [rb*T, C]
    proj = jnp.dot(attn.astype(x.dtype), wproj_ref[:],
                   preferred_element_type=jnp.float32)
    y = a + proj + bproj_ref[0].astype(jnp.float32)  # [rb*T, C] fp32

    if mlp_refs is not None:
        g2_ref, b2n_ref, w1_ref, bb1_ref, w2_ref, bb2_ref = mlp_refs
        hn2 = _layer_norm(y, g2_ref[0].astype(jnp.float32),
                          b2n_ref[0].astype(jnp.float32))
        hmid = jnp.dot(hn2.astype(x.dtype), w1_ref[:],
                       preferred_element_type=jnp.float32)
        hmid = hmid + bb1_ref[0].astype(jnp.float32)
        # tanh GELU: Mosaic has no erf (max dev ~3e-3, below bf16 resolution)
        hmid = jax.nn.gelu(hmid, approximate=True).astype(x.dtype)
        out2 = jnp.dot(hmid, w2_ref[:], preferred_element_type=jnp.float32)
        y = y + out2 + bb2_ref[0].astype(jnp.float32)

    o_ref[:] = y.reshape(rb, rp * window, wdim, c).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17))
def fused_swin_block(x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj,
                     rel_bias, mask, ln2_g, ln2_b, w1, b1, w2, b2,
                     num_heads, window):
    """Whole Swin block (attn + MLP halves) as one Pallas kernel.

    @param x: [B, H, W, C] (already cyclically rolled if shifted window)
    @param rel_bias: [nH, L, L] relative-position bias
    @param mask: [nW, L, L] additive shifted-window mask or None
    Returns [B, H, W, C].
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
    rb, rp, G, fuse_mlp = _plan(b, h, w, c, window, num_heads, hidden)
    n_grp = num_heads // G
    grid = (b // rb, h // (rp * window))

    # group the relative-position bias: [n_grp, L, G*L] with the G heads of
    # a group concatenated along lanes (matches the block-diag score layout)
    relg = jnp.concatenate(
        [jnp.concatenate([rel_bias[gg * G + g] for g in range(G)], axis=-1)[None]
         for gg in range(n_grp)], axis=0).astype(jnp.float32)

    ss3 = scale_shift.reshape(b, 1, 2 * c)
    vec = lambda v: v.reshape(1, -1)
    in_specs = [
        pl.BlockSpec((rb, rp * window, w, c), lambda bi, r: (bi, r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, 1, 2 * c), lambda bi, r: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ln1_g [1, C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ln1_b [1, C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wqkv [C, 3C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bqkv [1, 3C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wproj [C, C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bproj [1, C]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # relg [n_grp, L, G*L]
    ]
    args = [x, ss3, vec(ln1_g), vec(ln1_b), wqkv, vec(bqkv), wproj,
            vec(bproj), relg]

    has_mask = mask is not None
    if has_mask:
        # per-window mask tiled G x along lanes: [rows_img, n_win, L, G*L]
        mask_t = jnp.tile(mask.astype(jnp.float32), (1, 1, G))
        mask_t = mask_t.reshape(h // window, n_win, L, G * L)
        in_specs.append(pl.BlockSpec((rp, n_win, L, G * L),
                                     lambda bi, r: (r, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask_t)
    if fuse_mlp:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln2_g [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln2_b [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1 [C, H]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1 [1, H]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 [H, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2 [1, C]
        ]
        args += [vec(ln2_g), vec(ln2_b), w1, vec(b1), w2, vec(b2)]

    def kernel(*refs):
        xr, ssr, g1r, b1r, wqr, bqr, wpr, bpr, rgr = refs[:9]
        idx = 9
        mr = None
        if has_mask:
            mr = refs[idx]
            idx += 1
        mlp_refs = None
        if fuse_mlp:
            mlp_refs = refs[idx:idx + 6]
            idx += 6
        o_r, kh_r, vh_r = refs[idx], refs[idx + 1], refs[idx + 2]
        _kernel(xr, ssr, g1r, b1r, wqr, bqr, wpr, bpr, rgr, mr, mlp_refs,
                o_r, kh_r, vh_r, window=window, num_heads=num_heads,
                n_win=n_win, rb=rb, rp=rp, G=G)

    flops = (b * h * w * c * 4 * c * 2  # qkv + proj
             + (b * h * w * c * hidden * 4 if fuse_mlp else 0)  # fc1 + fc2
             + b * (h // window) * n_win * n_grp      # block-diag attention
             * 2 * L * (G * L) * (G * hd) * 2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, rp * window, w, c),
                               lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((G * L, G * hd), x.dtype),  # Khat
            pltpu.VMEM((G * L, G * hd), x.dtype),  # Vhat
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * h * w * (c + (hidden if fuse_mlp else 0))),
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

    # the TPU forward (fused kernel, or fused_mlp_block for the unfused MLP
    # half) computes tanh GELU; differentiate the same function.  Replicates
    # _fwd_impl's static dispatch exactly, including the unfused-MLP case
    # where fused_mlp_block could itself have bailed to the erf XLA path.
    if jax.default_backend() == "tpu" or INTERPRET:
        bb, hh, ww, cc = x.shape
        _, _, _, fuse_mlp = _plan(bb, hh, ww, cc, window, num_heads,
                                  w1.shape[1])
        if fuse_mlp:
            approx = True
        else:
            from .mlp_block_kernel import _fwd_kernel_path_taken
            approx = _fwd_kernel_path_taken(
                x.reshape(bb, hh * ww, cc), w1.shape[1])
    else:
        approx = False

    def fwd(xx, ss, g1, bb1n, wq, bq, wp, bp, rel, g2, bb2n, ww1, bbb1, ww2,
            bbb2):
        return swin_block_xla(xx, ss, g1, bb1n, wq, bq, wp, bp, rel, mask,
                              g2, bb2n, ww1, bbb1, ww2, bbb2,
                              num_heads, window, approximate=approx)

    _, vjp = jax.vjp(fwd, x, scale_shift, ln1_g, ln1_b, wqkv, bqkv, wproj,
                     bproj, rel_bias, ln2_g, ln2_b, w1, b1, w2, b2)
    (dx, dss, dg1, db1, dwq, dbq, dwp, dbp, drel, dg2, db2, dw1, dbb1, dw2,
     dbb2) = vjp(g)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (dx, dss, dg1, db1, dwq, dbq, dwp, dbp, drel, dmask, dg2, db2,
            dw1, dbb1, dw2, dbb2)


fused_swin_block.defvjp(_fwd, _bwd)
