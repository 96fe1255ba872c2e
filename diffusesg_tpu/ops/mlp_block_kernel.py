"""Fused MLP half-block Pallas TPU kernel.

Covers the FFN half of a SwinTransformerBlock
(reference: DiffuseSG/model/diffusesg/diffusesg.py:274-275):

    y = x + fc2(gelu(fc1(LayerNorm(x))))

in one kernel pass over token tiles: HBM traffic is one read + one write of
the activations; the LayerNorm statistics, the [T, hidden] intermediate and
both weight matrices stay in VMEM.

Backward: custom_vjp recomputing with plain XLA ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


INTERPRET = False  # tests flip this to run the Pallas kernel on CPU (interpret)


def _layer_norm(x, gamma, beta, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def mlp_block_xla(x, ln_gamma, ln_beta, w1, b1, w2, b2,
                  approximate: bool = False):
    """Reference XLA path: x [B, L, C]; tanh GELU when mirroring the TPU
    kernel (which has no erf), exact erf otherwise."""
    h = _layer_norm(x.astype(jnp.float32), ln_gamma, ln_beta).astype(x.dtype)
    h = jnp.dot(h, w1, preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=approximate).astype(x.dtype)
    out = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
    return x + out.astype(x.dtype)


def _erf_gelu(x):
    """In-kernel GELU.  Mosaic implements neither erf nor erfc, so the kernel
    uses the tanh approximation (max abs deviation ~3e-3 from exact GELU,
    below bf16 resolution at typical activation scales); the XLA path keeps
    the exact erf form for reference parity."""
    return jax.nn.gelu(x, approximate=True)


def _kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]  # [T, C] tile of the flattened (batch * tokens) axis
    h = _layer_norm(x.astype(jnp.float32), g_ref[0].astype(jnp.float32),
                    b_ref[0].astype(jnp.float32)).astype(x.dtype)
    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    h = _erf_gelu(h).astype(x.dtype)
    out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    out = out + b2_ref[0].astype(jnp.float32)
    o_ref[:] = (x.astype(jnp.float32) + out).astype(o_ref.dtype)


@jax.custom_vjp
def fused_mlp_block(x, ln_gamma, ln_beta, w1, b1, w2, b2):
    return _fwd_impl(x, ln_gamma, ln_beta, w1, b1, w2, b2)


def _pick_token_tile(n: int, c: int, hidden: int) -> int:
    """Token-tile size over the FLATTENED (batch * tokens) axis.  LayerNorm
    and the FFN are pointwise per token, so batch packing is free — small
    per-sample token counts (COCO 10x10 = 100, VG 8x8 = 64) no longer starve
    the MXU.  Largest power-of-2 divisor of n within a ~4MB fp32-hidden
    budget; 0 means no valid tile (caller falls back to XLA)."""
    best = 0
    t = 8
    while t <= n:
        if n % t == 0 and t * hidden * 4 <= 4 * 1024 * 1024:
            best = t
        t *= 2
    if best == 0 and n * hidden * 4 <= 4 * 1024 * 1024:
        return n  # whole axis as one block (block dims == array dims)
    return best


def _fwd_impl(x, ln_gamma, ln_beta, w1, b1, w2, b2):
    if jax.default_backend() != "tpu" and not INTERPRET:
        return mlp_block_xla(x, ln_gamma, ln_beta, w1, b1, w2, b2)
    b, L, c = x.shape
    hidden = w1.shape[1]
    n = b * L
    t = _pick_token_tile(n, c, hidden)
    if t == 0:
        return mlp_block_xla(x, ln_gamma, ln_beta, w1, b1, w2, b2)
    grid = (n // t,)

    vec = lambda v: v.reshape(1, -1)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gamma [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # beta [1, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1 [C, H]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1 [1, H]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 [H, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2 [1, C]
        ],
        out_specs=pl.BlockSpec((t, c), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * L * c * hidden * 4,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * L * hidden),
        interpret=INTERPRET,
    )(x.reshape(n, c), vec(ln_gamma), vec(ln_beta), w1, vec(b1), w2, vec(b2))
    return out.reshape(b, L, c)


def _fwd_kernel_path_taken(x, hidden: int) -> bool:
    """Replicates _fwd_impl's static dispatch: True iff the Pallas kernel
    (tanh GELU) produced the forward value."""
    if jax.default_backend() != "tpu" and not INTERPRET:
        return False
    b, L, c = x.shape
    return _pick_token_tile(b * L, c, hidden) != 0


def _fwd(x, ln_gamma, ln_beta, w1, b1, w2, b2):
    out = _fwd_impl(x, ln_gamma, ln_beta, w1, b1, w2, b2)
    return out, (x, ln_gamma, ln_beta, w1, b1, w2, b2)


def _gelu_tanh_grad(u):
    """d/du of the tanh-approximated GELU (matches the forward kernel)."""
    k = 0.7978845608028654  # sqrt(2/pi)
    u2 = u * u
    w = k * (u + 0.044715 * u * u2)
    t = jnp.tanh(w)
    return 0.5 * (1.0 + t) + 0.5 * u * (1.0 - t * t) * k * (1.0 + 3 * 0.044715 * u2)


def _mlp_bwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, dout_ref,
                    dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref, *, eps=1e-6):
    """Analytic backward for y = x + fc2(gelu(fc1(LN(x)))), one token tile.

    Weight/LN grads accumulate into constant-index output blocks that stay
    VMEM-resident across the whole grid (standard Pallas reduction pattern);
    program 0 initializes them."""
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x = x_ref[:].astype(jnp.float32)
    c = x.shape[-1]
    gam = g_ref[0].astype(jnp.float32)
    # recompute the forward pieces
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    hbar = (x - mean) * r
    hn = (hbar * gam + b_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
    u = jnp.dot(hn, w1_ref[:], preferred_element_type=jnp.float32)
    u = u + b1_ref[0].astype(jnp.float32)
    m = _erf_gelu(u).astype(x_ref.dtype)

    dout = dout_ref[:].astype(jnp.float32)
    doutb = dout.astype(x_ref.dtype)
    dm = jax.lax.dot_general(  # dout @ W2^T
        doutb, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2_ref[:] += jax.lax.dot_general(  # m^T @ dout
        m, doutb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(dout, axis=0, keepdims=True)
    du = dm * _gelu_tanh_grad(u)
    dub = du.astype(x_ref.dtype)
    dw1_ref[:] += jax.lax.dot_general(
        hn, dub, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(du, axis=0, keepdims=True)
    dhn = jax.lax.dot_general(
        dub, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dg_ref[:] += jnp.sum(dhn * hbar, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dhn, axis=0, keepdims=True)
    dh = dhn * gam
    # LayerNorm vjp (eps inside rsqrt; var through both mean terms)
    dx_ln = r * (dh - jnp.mean(dh, axis=-1, keepdims=True)
                 - hbar * jnp.mean(dh * hbar, axis=-1, keepdims=True))
    dx_ref[:] = (dout + dx_ln).astype(dx_ref.dtype)


def mlp_bwd_fits(c: int, hidden: int, t: int) -> bool:
    """Whether the analytic bwd kernel's accumulators + activations fit the
    scoped-VMEM budget (fp32 dW1/dW2 are the large fixed cost).  Lane dims
    are padded to 128 the way Mosaic tiles them (c=96 allocates 128 lanes)."""
    cp = -(-c // 128) * 128
    hp = -(-hidden // 128) * 128
    acc = c * hp * 4 + hp * cp * 4 + (2 * cp + 2 * hp) * 4
    act = t * (cp * 24 + hp * 16)
    return acc + act <= 12 * 1024 * 1024


def _mlp_bwd_export_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                           dout_ref, dx_ref, dg_ref, db_ref, du_ref, m_ref,
                           hn_ref, *, eps=1e-6):
    """Export-mode backward for wide MLPs (c=768, hidden=3072): the fp32
    dW1/dW2 accumulators alone exceed scoped VMEM, so the kernel EXPORTS
    the intermediates (du, m, hn) and the caller runs the two weight-grad
    matmuls in XLA (well-shaped [C,N]x[N,H] dots over HBM tensors)."""
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    x = x_ref[:].astype(jnp.float32)
    gam = g_ref[0].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    hbar = (x - mean) * r
    hn = (hbar * gam + b_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
    u = jnp.dot(hn, w1_ref[:], preferred_element_type=jnp.float32)
    u = u + b1_ref[0].astype(jnp.float32)
    m = _erf_gelu(u).astype(x_ref.dtype)

    dout = dout_ref[:].astype(jnp.float32)
    doutb = dout.astype(x_ref.dtype)
    dm = jax.lax.dot_general(
        doutb, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    du = dm * _gelu_tanh_grad(u)
    dub = du.astype(x_ref.dtype)
    dhn = jax.lax.dot_general(
        dub, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dg_ref[:] += jnp.sum(dhn * hbar, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dhn, axis=0, keepdims=True)
    dh = dhn * gam
    dx_ln = r * (dh - jnp.mean(dh, axis=-1, keepdims=True)
                 - hbar * jnp.mean(dh * hbar, axis=-1, keepdims=True))
    dx_ref[:] = (dout + dx_ln).astype(dx_ref.dtype)
    du_ref[:] = dub
    m_ref[:] = m
    hn_ref[:] = hn


def _mlp_bwd_export_call(x2d, ln_gamma, ln_beta, w1, b1, w2, g2d, t):
    n, c = x2d.shape
    hidden = w1.shape[1]
    vec = lambda v: v.reshape(1, -1)
    cix = lambda r: (0, 0)
    outs = pl.pallas_call(
        _mlp_bwd_export_kernel,
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec((t, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, hidden), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, hidden), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x2d.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, hidden), x2d.dtype),
            jax.ShapeDtypeStruct((n, hidden), x2d.dtype),
            jax.ShapeDtypeStruct((n, c), x2d.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * c * hidden * 2,
            bytes_accessed=n * (4 * c + 4 * hidden) * 2,
            transcendentals=2 * n * hidden),
        interpret=INTERPRET,
    )(x2d, vec(ln_gamma), vec(ln_beta), w1, vec(b1), w2, g2d)
    dx, dg_, db_, du, m, hn = outs
    # weight grads as two clean XLA dots over the exported intermediates
    dw1 = jax.lax.dot_general(hn, du, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(du.astype(jnp.float32), axis=0)
    dw2 = jax.lax.dot_general(m, g2d, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(g2d.astype(jnp.float32), axis=0)
    return dx, dg_[0], db_[0], dw1, db1, dw2, db2


def _legal_bwd_tiles(n: int, hidden: int) -> list[int]:
    """Candidate token tiles for the backward kernels, largest first.

    A tile is legal iff Pallas can lower its (t, C) block: t must be a
    multiple of 8 that divides n, OR the whole axis (block == array dim).
    Blindly halving a whole-axis tile (e.g. 300 -> 150) produced an illegal
    block and a TPU lowering error at odd COCO batch sizes — every
    candidate here is legal by construction.  The whole axis participates
    only under the same ~4MB fp32-hidden budget _pick_token_tile applies.
    """
    cands = sorted((d for d in range(8, n, 8) if n % d == 0), reverse=True)
    if n * hidden * 4 <= 4 * 1024 * 1024:
        cands.insert(0, n)
    return cands


def mlp_bwd_call(x2d, ln_gamma, ln_beta, w1, b1, w2, g2d):
    """Analytic MLP-half backward over flattened tokens.

    Returns (dx2d, dgamma, dbeta, dw1, db1, dw2, db2) or None when the
    kernel doesn't fit (caller falls back to the XLA vjp)."""
    n, c = x2d.shape
    hidden = w1.shape[1]
    if jax.default_backend() != "tpu" and not INTERPRET:
        return None
    cands = _legal_bwd_tiles(n, hidden)
    t = next((d for d in cands if d * hidden * 4 <= 4 * 1024 * 1024), 0)
    while t and not mlp_bwd_fits(c, hidden, t):
        t = next((d for d in cands if d < t), 0)
    if not t:
        # accumulators too big (c=768/H=3072: 19MB of fp32 dW alone):
        # export-mode kernel + XLA weight-grad dots
        te = next((d for d in cands
                   if d * (c * 24 + hidden * 16) <= 10 * 1024 * 1024), 0)
        if not te:
            return None
        return _mlp_bwd_export_call(x2d, ln_gamma, ln_beta, w1, b1, w2,
                                    g2d, te)

    vec = lambda v: v.reshape(1, -1)
    grid = (n // t,)
    cix = lambda r: (0, 0)
    outs = pl.pallas_call(
        _mlp_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gamma
            pl.BlockSpec(memory_space=pltpu.VMEM),  # beta
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec((t, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hidden), cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, c), cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), cix, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x2d.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * c * hidden * 2, bytes_accessed=4 * n * c * 2,
            transcendentals=2 * n * hidden),
        interpret=INTERPRET,
    )(x2d, vec(ln_gamma), vec(ln_beta), w1, vec(b1), w2, g2d)
    dx, dg_, db_, dw1, db1_, dw2, db2_ = outs
    return (dx, dg_[0], db_[0], dw1, db1_[0], dw2, db2_[0])


def _bwd(residuals, g):
    x, ln_gamma, ln_beta, w1, b1, w2, b2 = residuals
    b, L, c = x.shape
    res = mlp_bwd_call(x.reshape(b * L, c), ln_gamma, ln_beta, w1, b1, w2,
                       g.reshape(b * L, c).astype(x.dtype))
    if res is None:
        # differentiate the SAME function the forward evaluated: tanh GELU
        # if the forward took the Pallas kernel path, exact erf otherwise
        approx = _fwd_kernel_path_taken(x, w1.shape[1])
        _, vjp = jax.vjp(functools.partial(mlp_block_xla, approximate=approx),
                         x, ln_gamma, ln_beta, w1, b1, w2, b2)
        return vjp(g)
    dx, dg_, db_, dw1, db1_, dw2, db2_ = res
    # cotangent dtypes must match the primals (weights may arrive bf16)
    return (dx.reshape(b, L, c).astype(x.dtype), dg_.astype(ln_gamma.dtype),
            db_.astype(ln_beta.dtype), dw1.astype(w1.dtype),
            db1_.astype(b1.dtype), dw2.astype(w2.dtype),
            db2_.astype(b2.dtype))


fused_mlp_block.defvjp(_fwd, _bwd)
