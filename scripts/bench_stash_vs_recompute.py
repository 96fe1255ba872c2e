"""Decide stash-vs-recompute for the analytic backward kernels (round-3).

The fused backward kernels (ops/swin_block_v3.py, ops/mlp_block_kernel.py)
recompute the forward in-VMEM flash-style, streaming ~3x the forward FLOPs.
The alternative is stashing forward intermediates to HBM (attention qkv /
probabilities, MLP pre-activation u) and reading them back in the backward.
Per intermediate the trade is exactly:

    saved   = time(recompute matmul at the stage's shapes)
    paid    = time(HBM write in fwd) + time(HBM read in bwd)

both of which this script MEASURES on the real chip at the model's actual
stage geometries (batch 64, bf16), instead of trusting roofline constants.
Arithmetic-intensity view: the recompute matmul runs C/2 useful flops per
stashed byte, so stashing can only pay where C/2 exceeds the chip's
achieved-flops : achieved-bandwidth ratio — i.e. only the deepest stages
are even candidates.

Run: python scripts/bench_stash_vs_recompute.py   (one TPU process at a time)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("BENCH_BATCH", 64))
ITERS = 10

# (H, W, C, blocks) per VG stage; tokens = B*H*W
STAGES = [(64, 64, 96, 2), (32, 32, 192, 2), (16, 16, 384, 6), (8, 8, 768, 1)]


def _sync(r):
    # completion barrier with a TINY host fetch: block_until_ready can return
    # early under the tunnel, but transferring the full array would dominate
    # the timing — slice ONE element on device and fetch 2 bytes
    leaf = jax.tree.leaves(r)[0]
    return float(np.asarray(leaf[:1, :1]))


def _time(fn, *args):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(ITERS):
        r = fn(*args)
    _sync(r)
    return (time.time() - t0) / ITERS


def measure_matmul(tokens, c, cout):
    """Recompute cost: one [tokens, c] x [c, cout] bf16 matmul (a scan of 8
    amortizes dispatch, like the kernel microbenches)."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(tokens, c), jnp.bfloat16)
    w = jnp.asarray(rs.randn(c, cout), jnp.bfloat16)

    @jax.jit
    def run(x, w):
        def step(carry, _):
            y = jnp.dot(carry, w, preferred_element_type=jnp.float32)
            # fold back to [tokens, c] so the scan carries a fixed shape
            return (y[:, :c]).astype(jnp.bfloat16), ()
        out, _ = jax.lax.scan(step, x, None, length=8)
        return out

    dt = _time(run, x, w) / 8
    flops = 2 * tokens * c * cout
    return dt, flops


def measure_stream(tokens, cout):
    """Stash cost: one full HBM read + write of [tokens, cout] bf16 (y=x+1
    cannot fuse away; scan of 8 amortizes dispatch)."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(tokens, cout), jnp.bfloat16)

    @jax.jit
    def run(x):
        def step(carry, _):
            return carry + jnp.bfloat16(1.0), ()
        out, _ = jax.lax.scan(step, x, None, length=8)
        return out

    dt = _time(run, x) / 8
    bytes_moved = 2 * tokens * cout * 2  # read + write, bf16
    return dt, bytes_moved


def main():
    print(f"devices: {jax.devices()}  batch={B}", flush=True)
    total_saved = 0.0
    rows = []
    for h, w, c, blocks in STAGES:
        tokens = B * h * w
        # the two big recomputes per block: qkv in-proj (c -> 3c) in the
        # attention half, fc1 up-proj (c -> 4c) in the MLP half
        for name, cout in (("qkv", 3 * c), ("fc1", 4 * c)):
            t_mm, flops = measure_matmul(tokens, c, cout)
            # stash traffic: write [tokens, cout] once in fwd, read once in
            # bwd == one read+write pass
            t_st, nbytes = measure_stream(tokens, cout)
            net = t_mm - t_st  # >0: stashing wins
            total_saved += max(net, 0.0) * blocks
            rows.append((f"{h}x{w} C={c} {name}", tokens, cout,
                         t_mm * 1e3, flops / t_mm / 1e12,
                         t_st * 1e3, nbytes / t_st / 1e9,
                         net * 1e3, blocks))
    print(f"{'stage/op':22s} {'tokens':>7s} {'cout':>5s} {'recomp ms':>9s} "
          f"{'TF/s':>6s} {'stash ms':>8s} {'GB/s':>6s} {'net ms':>7s} {'xblk':>4s}",
          flush=True)
    for r in rows:
        print(f"{r[0]:22s} {r[1]:7d} {r[2]:5d} {r[3]:9.3f} {r[4]:6.1f} "
              f"{r[5]:8.3f} {r[6]:6.0f} {r[7]:+7.3f} {r[8]:4d}", flush=True)
    print(f"\nbest-case step saving if every positive-net intermediate were "
          f"stashed: {total_saved*1e3:.2f} ms "
          f"(vs ~87 ms/step measured round-2)", flush=True)


if __name__ == "__main__":
    main()
