"""Per-stage timing of the fully-fused Swin block kernel vs XLA on TPU.

Times each (res, C, nh) stage of the VG full config as a WHOLE Swin block
(noise affine + LN + window attention + proj + MLP) through the v2 kernel
(ops/swin_full_block.fused_swin_block) and the XLA composition, scan-chained
inside one jit (per-dispatch overhead through the tunneled backend is
milliseconds, so only amortized scans are reliable).  Prints per-call ms,
useful-FLOPs MFU, and the residual of the full forward not accounted for by
the blocks (patch merge/expand, embeddings, heads).

Usage: python scripts/profile_full_block.py [--skip-full] [--stage N]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from diffusesg_tpu.models.layers import (
    relative_position_index, shifted_window_attn_mask)
from diffusesg_tpu.ops.swin_full_block import fused_swin_block, swin_block_xla
from diffusesg_tpu.ops.swin_block_v3 import fused_swin_block_v3

B = int(os.environ.get("BENCH_BATCH", 64))
PEAK_TFLOPS = 197.0  # v5e bf16

if "--coco" in sys.argv:
    WINDOW = 10
    # COCO config: depths [1,2,6], window 10 (configs/..._coco.yaml)
    STAGES = [
        (40, 96, 3, 2, 0),
        (20, 192, 6, 4, 2),
        (10, 384, 12, 12, 0),
    ]
else:
    WINDOW = 8
    # (res, C, nh, count, shifted_count) over down+up paths of the VG config
    STAGES = [
        (64, 96, 3, 2, 0),
        (32, 192, 6, 2, 0),
        (16, 384, 12, 6, 2),
        (8, 768, 24, 2, 0),
    ]


def _force(o):
    # fetch ONE element (device-side index first): fetching the full array
    # through the tunnel costs seconds and corrupts amortized timings
    jax.block_until_ready(o)
    leaf = jax.tree.leaves(o)[0]
    return float(np.asarray(leaf[(0,) * leaf.ndim]))


def timeit(fn, x, iters):
    @jax.jit
    def run(x0):
        def body(c, _):
            return fn(c), ()
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out
    _force(run(x))
    t0 = time.time()
    _force(run(x))
    return (time.time() - t0) / iters * 1000.0


def make_args(res, c, nh, shifted):
    rng = np.random.RandomState(0)
    hidden = 4 * c
    x = jnp.asarray(rng.randn(B, res, res, c), jnp.bfloat16)
    ss = jnp.asarray(rng.randn(B, 2 * c) * 0.1, jnp.bfloat16)
    g1 = jnp.ones((c,), jnp.float32)
    b1 = jnp.zeros((c,), jnp.float32)
    wqkv = jnp.asarray(rng.randn(c, 3 * c) * 0.02, jnp.bfloat16)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jnp.asarray(rng.randn(c, c) * 0.02, jnp.bfloat16)
    bproj = jnp.zeros((c,), jnp.float32)
    L = WINDOW * WINDOW
    table = rng.randn((2 * WINDOW - 1) ** 2, nh) * 0.02
    rel = table[relative_position_index(WINDOW).reshape(-1)]
    rel = jnp.asarray(rel.reshape(L, L, nh).transpose(2, 0, 1), jnp.float32)
    mask = None
    if shifted:
        mask = jnp.asarray(shifted_window_attn_mask(res, res, WINDOW, WINDOW // 2))
    g2 = jnp.ones((c,), jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)
    w1 = jnp.asarray(rng.randn(c, hidden) * 0.02, jnp.bfloat16)
    bb1 = jnp.zeros((hidden,), jnp.float32)
    w2 = jnp.asarray(rng.randn(hidden, c) * 0.02, jnp.bfloat16)
    bb2 = jnp.zeros((c,), jnp.float32)
    return x, (ss, g1, b1, wqkv, bqkv, wproj, bproj, rel, mask,
               g2, b2, w1, bb1, w2, bb2)


def useful_gflops(res, c, nh):
    """qkv + proj + fc1 + fc2 matmuls + per-head attention (no block-diag
    padding waste): the FLOPs an ideal implementation must do."""
    T = B * res * res
    L = WINDOW * WINDOW
    mm = T * c * (3 * c + c + 4 * c + 4 * c) * 2
    attn = B * (res * res // L) * nh * 2 * L * L * (c // nh) * 2
    return (mm + attn) / 1e9


def bench_stage(res, c, nh, shifted, iters=200):
    x, rest = make_args(res, c, nh, shifted)
    fn_f = lambda xx: fused_swin_block(xx, *rest, nh, WINDOW)
    fn_3 = lambda xx: fused_swin_block_v3(xx, *rest, nh, WINDOW)
    fn_x = lambda xx: swin_block_xla(xx, *rest, num_heads=nh, window=WINDOW)
    tf = timeit(fn_f, x, iters)
    t3 = timeit(fn_3, x, iters)
    tx = timeit(fn_x, x, iters) if "--xla" in sys.argv else float("nan")
    return tf, t3, tx


def bench_full(iters=20):
    from diffusesg_tpu.config import load_config
    from diffusesg_tpu.models import build_model
    from diffusesg_tpu.models.factory import init_params
    from diffusesg_tpu.models.precond import precond_forward
    cfg = load_config(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "configs/edm_diffuse_sg_regular_visual_genome.yaml"))
    model = build_model(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    n = cfg.dataset.max_node_num
    flags = jnp.ones((B, n), dtype=bool)
    sig = jnp.full((B,), 1.0, jnp.float32)

    def model_fn(aa, xx, f, c_noise, s_a, s_x):
        return model.apply(params, aa, xx, f, c_noise, s_a, s_x)

    def step(carry):
        a, x = carry
        da, dx = precond_forward(model_fn, "edm", a, x, flags, sig, a, x)
        return (da, dx)

    rng = np.random.RandomState(0)
    a0 = jnp.asarray(rng.randn(B, n, n), jnp.float32)
    x0 = jnp.asarray(rng.randn(B, n, 5), jnp.float32)

    @jax.jit
    def run(carry):
        def body(c, _):
            return step(c), ()
        out, _ = jax.lax.scan(body, carry, None, length=iters)
        return out
    _force(run((a0, x0)))
    t0 = time.time()
    _force(run((a0, x0)))
    return (time.time() - t0) / iters * 1000.0


def main():
    only = None
    if "--stage" in sys.argv:
        only = int(sys.argv[sys.argv.index("--stage") + 1])
    print(f"backend={jax.default_backend()} batch={B} dtype=bfloat16")
    total_f = total_3 = 0.0
    for i, (res, c, nh, count, shifted_count) in enumerate(STAGES):
        if only is not None and i != only:
            continue
        gf = useful_gflops(res, c, nh)
        tf, t3, tx = bench_stage(res, c, nh, False)
        mfu_f = gf / tf / PEAK_TFLOPS * 100
        mfu_3 = gf / t3 / PEAK_TFLOPS * 100
        n_plain = count - shifted_count
        print(f"block {res:3d}x{res:<3d} C={c:<4d} v2 {tf:7.3f} ms ({mfu_f:4.1f}%) "
              f"v3 {t3:7.3f} ms ({mfu_3:4.1f}%) xla {tx:7.3f} ms  x{n_plain}",
              flush=True)
        total_f += tf * n_plain
        total_3 += t3 * n_plain
        if shifted_count:
            tfs, t3s, txs = bench_stage(res, c, nh, True)
            print(f"block {res:3d}x{res:<3d} C={c:<4d} SHIFT v2 {tfs:7.3f} ms "
                  f"v3 {t3s:7.3f} ms xla {txs:7.3f} ms  x{shifted_count}",
                  flush=True)
            total_f += tfs * shifted_count
            total_3 += t3s * shifted_count
    print(f"TOTAL blocks: v2 {total_f:.3f} ms   v3 {total_3:.3f} ms")
    if "--skip-full" not in sys.argv and only is None:
        tfull = bench_full()
        print(f"FULL precond forward {tfull:.3f} ms  (rest = {tfull - total_f:.3f} ms)")


if __name__ == "__main__":
    main()
