"""A/B: round-1 swin kernel (known-good on TPU) vs current one, two harnesses.

Usage: python scripts/ab_kernel.py  (expects /tmp/k1/swin_r1.py extracted from
git).  Prints per-call ms for scan-chained and queued-dispatch timing.
"""
from __future__ import annotations

import importlib.util
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

from diffusesg_tpu.models.layers import relative_position_index
from diffusesg_tpu.ops import swin_block_kernel as cur

spec = importlib.util.spec_from_file_location("swin_r1", "/tmp/k1/swin_r1.py")
r1 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(r1)

B = 64
WINDOW = 8


def make_args(res, c, nh):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, res, res, c), jnp.bfloat16)
    ss = jnp.asarray(rng.randn(B, 2 * c) * 0.1, jnp.bfloat16)
    g = jnp.ones((c,), jnp.float32)
    b = jnp.zeros((c,), jnp.float32)
    wqkv = jnp.asarray(rng.randn(c, 3 * c) * 0.02, jnp.bfloat16)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jnp.asarray(rng.randn(c, c) * 0.02, jnp.bfloat16)
    bproj = jnp.zeros((c,), jnp.float32)
    L = WINDOW * WINDOW
    table = rng.randn((2 * WINDOW - 1) ** 2, nh) * 0.02
    rel = table[relative_position_index(WINDOW).reshape(-1)]
    rel = jnp.asarray(rel.reshape(L, L, nh).transpose(2, 0, 1), jnp.float32)
    return x, (ss, g, b, wqkv, bqkv, wproj, bproj, rel)


def _force(o):
    jax.block_until_ready(o)
    return float(np.asarray(o).ravel()[0])


def t_scan(f, x, rest, nh, iters=100):
    @jax.jit
    def run(x0):
        def body(c, _):
            return f(c, *rest, None, nh, WINDOW), ()
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out
    _force(run(x))
    t0 = time.time()
    _force(run(x))
    return (time.time() - t0) / iters * 1000.0


def t_queue(f, x, rest, nh, iters=30):
    g = jax.jit(lambda xx: f(xx, *rest, None, nh, WINDOW))
    o = g(x)
    _force(o)
    t0 = time.time()
    for _ in range(iters):
        o = g(o)  # chained to prevent overlap-free reordering
    _force(o)
    return (time.time() - t0) / iters * 1000.0


def main():
    for res, c, nh in [(64, 96, 3), (16, 384, 12)]:
        x, rest = make_args(res, c, nh)
        for name, mod in [("r1 ", r1), ("cur", cur)]:
            f = mod.fused_swin_attn_block
            ts = t_scan(f, x, rest, nh)
            tq = t_queue(f, x, rest, nh)
            print(f"{name} {res}x{res} C={c}: scan {ts:.3f} ms  queue {tq:.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
