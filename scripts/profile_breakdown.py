"""Per-kernel timing breakdown of the VG denoiser forward on TPU.

Times each fused Swin-attention / MLP half-block shape (and optionally the
XLA fallbacks) by chaining K iterations through a lax.scan inside one jit —
the only reliable methodology under the tunneled backend, where per-dispatch
overhead is milliseconds.  Prints a table of per-call ms and the total
accounted vs the measured full forward.

Usage: python scripts/profile_breakdown.py [--xla] [--skip-full]
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
from diffusesg_tpu.ops.swin_block_kernel import (
    fused_swin_attn_block, swin_attn_block_xla)
from diffusesg_tpu.ops.mlp_block_kernel import fused_mlp_block, mlp_block_xla

B = int(os.environ.get("BENCH_BATCH", 64))
DTYPE = jnp.bfloat16
WINDOW = 8

# (res, C, nh, count, shifted_count) over down+up paths of the VG config
STAGES = [
    (64, 96, 3, 2, 0),
    (32, 192, 6, 2, 0),
    (16, 384, 12, 6, 2),
    (8, 768, 24, 2, 0),
]


def _force(o):
    jax.block_until_ready(o)
    return float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])


def timeit(fn, x, iters):
    """fn: x -> x (same shape) chained through a scan; returns per-call ms."""
    @jax.jit
    def run(x0):
        def body(c, _):
            return fn(c), ()
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out
    _force(run(x))  # compile
    t0 = time.time()
    _force(run(x))
    return (time.time() - t0) / iters * 1000.0


def bench_attn(res, c, nh, shifted, use_xla, iters=200):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, res, res, c), DTYPE)
    ss = jnp.asarray(rng.randn(B, 2 * c) * 0.1, DTYPE)
    g = jnp.ones((c,), jnp.float32)
    b = jnp.zeros((c,), jnp.float32)
    wqkv = jnp.asarray(rng.randn(c, 3 * c) * 0.02, DTYPE)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jnp.asarray(rng.randn(c, c) * 0.02, DTYPE)
    bproj = jnp.zeros((c,), jnp.float32)
    L = WINDOW * WINDOW
    table = rng.randn((2 * WINDOW - 1) ** 2, nh) * 0.02
    rel = table[relative_position_index(WINDOW).reshape(-1)]
    rel = jnp.asarray(rel.reshape(L, L, nh).transpose(2, 0, 1), jnp.float32)
    mask = None
    if shifted:
        mask = jnp.asarray(shifted_window_attn_mask(res, res, WINDOW, WINDOW // 2))
    f = swin_attn_block_xla if use_xla else fused_swin_attn_block
    if use_xla:
        fn = lambda xx: f(xx, ss, g, b, wqkv, bqkv, wproj, bproj, rel, mask,
                          num_heads=nh, window=WINDOW)
    else:
        fn = lambda xx: f(xx, ss, g, b, wqkv, bqkv, wproj, bproj, rel, mask,
                          nh, WINDOW)
    return timeit(fn, x, iters)


def bench_mlp(res, c, use_xla, iters=200):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, res * res, c), DTYPE)
    g = jnp.ones((c,), jnp.float32)
    bta = jnp.zeros((c,), jnp.float32)
    w1 = jnp.asarray(rng.randn(c, 4 * c) * 0.02, DTYPE)
    b1 = jnp.zeros((4 * c,), jnp.float32)
    w2 = jnp.asarray(rng.randn(4 * c, c) * 0.02, DTYPE)
    b2 = jnp.zeros((c,), jnp.float32)
    f = mlp_block_xla if use_xla else fused_mlp_block
    fn = lambda xx: f(xx, g, bta, w1, b1, w2, b2)
    return timeit(fn, x, iters)


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
    use_xla = "--xla" in sys.argv
    tag = "XLA " if use_xla else "fused"
    print(f"backend={jax.default_backend()} batch={B} dtype=bfloat16 path={tag}")
    total = 0.0
    rows = []
    for res, c, nh, count, shifted_count in STAGES:
        t = bench_attn(res, c, nh, False, use_xla)
        rows.append((f"attn {res}x{res} C={c} nh={nh}", t, count - shifted_count))
        total += t * (count - shifted_count)
        if shifted_count:
            ts = bench_attn(res, c, nh, True, use_xla)
            rows.append((f"attn {res}x{res} C={c} nh={nh} SHIFT", ts, shifted_count))
            total += ts * shifted_count
        tm = bench_mlp(res, c, use_xla)
        rows.append((f"mlp  {res}x{res} C={c}", tm, count))
        total += tm * count
    for name, t, cnt in rows:
        print(f"{name:34s} {t:8.3f} ms x{cnt}  = {t * cnt:8.3f} ms")
    print(f"{'TOTAL accounted (blocks)':34s} {'':8s}      {total:8.3f} ms")
    if "--skip-full" not in sys.argv:
        tf = bench_full()
        print(f"{'FULL precond forward':34s} {tf:8.3f} ms   (rest = {tf - total:.3f} ms)")


if __name__ == "__main__":
    main()
