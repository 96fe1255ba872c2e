"""Regression check on real TPU: odd batches at a full-grid window-10 stage
(COCO 10x10, L=100) through the v3 fused block, forward AND backward.

Covers two formerly-broken paths:
* forward: P=1 pair packing at L=100 (sublane-misaligned geometry) — now
  guarded in _fwd_impl, falls back to the XLA composition;
* backward: mlp_bwd_call halving a 300-token whole-axis tile to an illegal
  150-row block (Pallas TPU lowering error) — now _legal_bwd_tiles only
  emits lowerable tiles.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import diffusesg_tpu.ops.swin_block_v3 as v3


def mk(b, hw, c, nh, window, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 8)
    L = window * window
    x = jax.random.normal(ks[0], (b, hw, hw, c), jnp.bfloat16)
    ss = jax.random.normal(ks[1], (b, 2 * c), jnp.bfloat16)
    g1 = jnp.ones((c,), jnp.float32); b1n = jnp.zeros((c,), jnp.float32)
    wqkv = jax.random.normal(ks[2], (c, 3 * c), jnp.bfloat16) * 0.02
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jax.random.normal(ks[3], (c, c), jnp.bfloat16) * 0.02
    bproj = jnp.zeros((c,), jnp.float32)
    rel = jax.random.normal(ks[4], (nh, L, L), jnp.float32) * 0.02
    g2 = jnp.ones((c,), jnp.float32); b2n = jnp.zeros((c,), jnp.float32)
    w1 = jax.random.normal(ks[5], (c, 4 * c), jnp.bfloat16) * 0.02
    bb1 = jnp.zeros((4 * c,), jnp.float32)
    w2 = jax.random.normal(ks[6], (4 * c, c), jnp.bfloat16) * 0.02
    bb2 = jnp.zeros((c,), jnp.float32)
    return (x, ss, g1, b1n, wqkv, bqkv, wproj, bproj, rel, None,
            g2, b2n, w1, bb1, w2, bb2)


ok = True
for b in (1, 3):
    args = mk(b, 10, 384, 12, 10)
    out = jax.jit(lambda *a: v3.fused_swin_block_v3(*a, 12, 10))(*args)
    ref = v3.swin_block_xla(*args, 12, 10)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    gx = jax.jit(jax.grad(lambda x_, rest: jnp.sum(
        v3.fused_swin_block_v3(x_, *rest, 12, 10).astype(jnp.float32) ** 2)))(
            args[0], tuple(args[1:]))
    finite = bool(jnp.all(jnp.isfinite(gx.astype(jnp.float32))))
    print(f"b={b}: fwd max|err| vs XLA = {err:.3e}, grad finite = {finite}")
    ok = ok and err < 0.25 and finite
print("ODD_BATCH_OK" if ok else "ODD_BATCH_FAILED")
sys.exit(0 if ok else 1)
