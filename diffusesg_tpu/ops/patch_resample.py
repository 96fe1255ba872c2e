"""Fused PatchMerging / PatchBreakup Pallas TPU kernels.

The reference resamples between Swin stages with 2x2 space-to-depth +
LayerNorm + Linear (PatchMerging, reference:
DiffuseSG/model/diffusesg/diffusesg.py:298-344) and the inverse
depth-to-space chain Linear + LN + scatter + LN + Linear (PatchBreakup,
diffusesg.py:347-412).

Under plain XLA the 6-D gather/scatter transposes materialize as fp32
copies with degenerate (2,128)-tiled layouts — the profiler trace shows
~2.6 ms/forward at the 64<->32 boundary alone (5 ops x ~0.4 ms).  These
kernels do the whole resample in ONE pass per tile: the 2x2 interleave is
sublane slicing/stacking in VMEM (the lane/channel dim is never touched),
LayerNorm statistics stay in registers, and the projection runs on the MXU
— HBM traffic falls to one read + one write of the activations in bf16.

Channel order matches the reference exactly: merge concat k = wo*2 + ho ->
[x(0,0), x(1,0), x(0,1), x(1,1)] (h-offset fastest), breakup chunk k ->
offset (ho = k % 2, wo = k // 2).

Backward: custom_vjp recomputing with the plain XLA composition.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False  # tests flip this to run the Pallas kernels on CPU


def _ln(x, gamma, beta, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


# ---------------------------------------------------------------- merging

def patch_merge_xla(x, ln_g, ln_b, w):
    """Reference composition: [B, H, W, C] -> [B, H/2, W/2, 2C]."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // 2, 2, ww // 2, 2, c)
    x = x.transpose(0, 1, 3, 4, 2, 5)  # [b, h/2, w/2, wo, ho, c]
    x = x.reshape(b, h // 2, ww // 2, 4 * c)
    x = _ln(x, ln_g.astype(jnp.float32), ln_b.astype(jnp.float32))
    return jnp.dot(x.astype(w.dtype), w,
                   preferred_element_type=jnp.float32).astype(w.dtype)


def _merge_kernel(x_ref, g_ref, b_ref, w_ref, o_ref, *, rb, rt):
    c = x_ref.shape[-1]
    ww = x_ref.shape[2]
    parts = []
    for rbi in range(rb):
        xt = x_ref[rbi]                        # [2*rt, W, C]
        xr = xt.reshape(rt, 2, ww // 2, 2, c)  # (i, ho, j, wo, c)
        # Mosaic-safe gather: move the parity dims to the FRONT (non-lane
        # transpose), then leading-dim integer indexing + lane concat —
        # mixed-position int indexing lowers to an unsupported pattern
        xq = xr.transpose(1, 3, 0, 2, 4)       # (ho, wo, i, j, c)
        quads = [xq[ho, wo].reshape(rt * (ww // 2), c)
                 for wo in range(2) for ho in range(2)]  # k = wo*2 + ho
        parts.append(jnp.concatenate(quads, axis=-1))    # [rt*W/2, 4C]
    xcat = jnp.concatenate(parts, axis=0) if rb > 1 else parts[0]
    hn = _ln(xcat, g_ref[0].astype(jnp.float32), b_ref[0].astype(jnp.float32))
    out = jnp.dot(hn.astype(w_ref.dtype), w_ref[:],
                  preferred_element_type=jnp.float32)
    o_ref[:] = out.reshape(rb, rt, ww // 2, 2 * c).astype(o_ref.dtype)


@jax.custom_vjp
def fused_patch_merge(x, ln_g, ln_b, w):
    """PatchMerging as one Pallas pass (2x2 gather + LN(4C) + Dense 4C->2C).

    @param x: [B, H, W, C];  @param w: [4C, 2C] (no bias, as the reference)
    Returns [B, H/2, W/2, 2C].
    """
    return _merge_fwd_impl(x, ln_g, ln_b, w)


def _resample_tile(b, h, c, bytes_per_tok, limit=8 * 1024 * 1024):
    """(rb, rt): batch x out-row packing under a VMEM budget.  Mosaic
    materializes fp32 copies of the transposed tiles, so the effective
    bytes/token is several times the naive estimate — these factors are
    calibrated against measured scoped-vmem usage (26M at 2x the known-good
    tile), not derived."""
    rb, rt = 1, 1
    while rt * 2 <= h // 2 and (h // 2) % (rt * 2) == 0 \
            and rt * 2 * c * bytes_per_tok <= limit:
        rt *= 2
    while rb * 2 <= b and b % (rb * 2) == 0 \
            and rb * 2 * rt * c * bytes_per_tok <= limit:
        rb *= 2
    return rb, rt


def _merge_fwd_impl(x, ln_g, ln_b, w):
    if jax.default_backend() != "tpu" and not INTERPRET:
        return patch_merge_xla(x, ln_g, ln_b, w)
    b, h, ww, c = x.shape
    rb, rt = _resample_tile(b, h, ww * c, 22)
    grid = (b // rb, (h // 2) // rt)
    vec = lambda v: v.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_merge_kernel, rb=rb, rt=rt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, 2 * rt, ww, c), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, rt, ww // 2, 2 * c),
                               lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, ww // 2, 2 * c), w.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * (h // 2) * (ww // 2) * 4 * c * 2 * c * 2,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        interpret=INTERPRET,
    )(x, vec(ln_g), vec(ln_b), w)


def _merge_fwd(x, ln_g, ln_b, w):
    return _merge_fwd_impl(x, ln_g, ln_b, w), (x, ln_g, ln_b, w)


def _merge_bwd(res, g):
    x, ln_g, ln_b, w = res
    _, vjp = jax.vjp(patch_merge_xla, x, ln_g, ln_b, w)
    return vjp(g)


fused_patch_merge.defvjp(_merge_fwd, _merge_bwd)


# ---------------------------------------------------------------- breakup

def patch_breakup_xla(x, w_in, ln1_g, ln1_b, ln2_g, ln2_b, w_out):
    """Reference composition: [B, H, W, Cin] -> [B, 2H, 2W, Cout] where
    Dense Cin->dim, LN, depth-to-space (dim = 4*Cout), LN, Dense Cout->Cout."""
    b, h, ww, cin = x.shape
    dim = w_in.shape[1]
    c_out = dim // 4
    y = jnp.dot(x.astype(w_in.dtype), w_in, preferred_element_type=jnp.float32)
    y = _ln(y, ln1_g.astype(jnp.float32), ln1_b.astype(jnp.float32)).astype(w_in.dtype)
    y = y.reshape(b, h, ww, 2, 2, c_out)          # [b, h, w, wo, ho, c]
    y = y.transpose(0, 1, 4, 2, 3, 5)             # [b, h, ho, w, wo, c]
    y = y.reshape(b, 2 * h, 2 * ww, c_out)
    y = _ln(y, ln2_g.astype(jnp.float32), ln2_b.astype(jnp.float32))
    return jnp.dot(y.astype(w_out.dtype), w_out,
                   preferred_element_type=jnp.float32).astype(w_out.dtype)


def _breakup_kernel(x_ref, wi_ref, g1_ref, b1_ref, g2_ref, b2_ref, wo_ref,
                    o_ref, *, rb, rt):
    cin = x_ref.shape[-1]
    ww = x_ref.shape[2]
    dim = wi_ref.shape[1]
    c_out = dim // 4
    parts = []
    for rbi in range(rb):
        xt = x_ref[rbi].reshape(rt * ww, cin)
        y = jnp.dot(xt.astype(wi_ref.dtype), wi_ref[:],
                    preferred_element_type=jnp.float32)
        y = _ln(y, g1_ref[0].astype(jnp.float32),
                b1_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
        # chunk k = wo*2 + ho -> pixel (2i+ho, 2j+wo); chunks via LANE
        # slices of the [rt*W, 4c] layout (lane-dim reshapes are illegal),
        # interleave via leading-dim stack + non-lane transpose
        chunks = [y[:, k * c_out:(k + 1) * c_out].reshape(rt, ww, c_out)
                  for k in range(4)]
        z = jnp.stack([jnp.stack([chunks[0], chunks[2]], axis=0),   # ho=0: wo 0,1
                       jnp.stack([chunks[1], chunks[3]], axis=0)],  # ho=1
                      axis=0)                       # (ho, wo, i, j, c)
        z = z.transpose(2, 0, 3, 1, 4)              # (i, ho, j, wo, c)
        parts.append(z.reshape(2 * rt * 2 * ww, c_out))
    ycat = jnp.concatenate(parts, axis=0) if rb > 1 else parts[0]
    hn = _ln(ycat, g2_ref[0].astype(jnp.float32), b2_ref[0].astype(jnp.float32))
    out = jnp.dot(hn.astype(wo_ref.dtype), wo_ref[:],
                  preferred_element_type=jnp.float32)
    o_ref[:] = out.reshape(rb, 2 * rt, 2 * ww, c_out).astype(o_ref.dtype)


@jax.custom_vjp
def fused_patch_breakup(x, w_in, ln1_g, ln1_b, ln2_g, ln2_b, w_out):
    """PatchBreakup as one Pallas pass (Dense + LN + 2x2 scatter + LN + Dense).

    @param x: [B, H, W, Cin];  @param w_in: [Cin, 4*Cout];
    @param w_out: [Cout, Cout].  Returns [B, 2H, 2W, Cout].
    """
    return _breakup_fwd_impl(x, w_in, ln1_g, ln1_b, ln2_g, ln2_b, w_out)


def _breakup_fwd_impl(x, w_in, ln1_g, ln1_b, ln2_g, ln2_b, w_out):
    if jax.default_backend() != "tpu" and not INTERPRET:
        return patch_breakup_xla(x, w_in, ln1_g, ln1_b, ln2_g, ln2_b, w_out)
    b, h, ww, cin = x.shape
    dim = w_in.shape[1]
    c_out = dim // 4
    rb, rt = _resample_tile(b, 2 * h, ww * cin, 30)
    grid = (b // rb, h // rt)
    vec = lambda v: v.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_breakup_kernel, rb=rb, rt=rt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, rt, ww, cin), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((rb, 2 * rt, 2 * ww, c_out),
                               lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * ww, c_out), w_out.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * h * ww * (cin * dim + 4 * c_out * c_out) * 2,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        interpret=INTERPRET,
    )(x, w_in, vec(ln1_g), vec(ln1_b), vec(ln2_g), vec(ln2_b), w_out)


def _breakup_fwd(x, w_in, ln1_g, ln1_b, ln2_g, ln2_b, w_out):
    out = _breakup_fwd_impl(x, w_in, ln1_g, ln1_b, ln2_g, ln2_b, w_out)
    return out, (x, w_in, ln1_g, ln1_b, ln2_g, ln2_b, w_out)


def _breakup_bwd(res, g):
    _, vjp = jax.vjp(patch_breakup_xla, *res)
    return vjp(g)


fused_patch_breakup.defvjp(_breakup_fwd, _breakup_bwd)
