"""Micro-benchmark: int8 vs bf16 matmul throughput through Pallas on this chip.

Decides whether an int8 inference path is worth building: v5e advertises
2x MXU throughput for int8 (394 TOPS vs 197 TFLOP/s bf16). Measures a
compute-bound kernel (R dependent-free matmuls per grid step) at the
model's actual shapes.
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 64  # matmuls per grid program (independent accumulators in pairs)


def mm_kernel(a_ref, b_ref, o_ref, *, acc_dtype):
    acc0 = jnp.zeros(o_ref.shape, acc_dtype)
    acc1 = jnp.zeros(o_ref.shape, acc_dtype)

    def body(i, accs):
        a0, a1 = accs
        a0 = a0 + jnp.dot(a_ref[:], b_ref[:], preferred_element_type=acc_dtype)
        a1 = a1 + jnp.dot(a_ref[:], b_ref[:], preferred_element_type=acc_dtype)
        return a0, a1

    acc0, acc1 = jax.lax.fori_loop(0, R // 2, body, (acc0, acc1))
    o_ref[:] = (acc0 + acc1).astype(o_ref.dtype)


def run(m, k, n, in_dtype, acc_dtype, grid=16):
    rs = np.random.RandomState(0)
    if in_dtype == jnp.int8:
        a = jnp.asarray(rs.randint(-127, 127, (m, k)), jnp.int8)
        b = jnp.asarray(rs.randint(-127, 127, (k, n)), jnp.int8)
        out_dtype = jnp.int32
    else:
        a = jnp.asarray(rs.randn(m, k), in_dtype)
        b = jnp.asarray(rs.randn(k, n), in_dtype)
        out_dtype = jnp.float32
    fn = pl.pallas_call(
        functools.partial(mm_kernel, acc_dtype=acc_dtype),
        grid=(grid,),
        in_specs=[pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
    )
    jfn = jax.jit(fn)
    r = jfn(a, b); _ = np.asarray(r[0, 0])
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        r = jfn(a, b)
    _ = np.asarray(r[0, 0])
    dt = (time.time() - t0) / iters
    ops = 2 * m * k * n * R * grid
    print(f"[{m}x{k}x{n}] {jnp.dtype(in_dtype).name}: {dt*1e3:.2f} ms "
          f"-> {ops/dt/1e12:.1f} T(FL)OP/s", flush=True)
    return ops / dt


if __name__ == "__main__":
    for (m, k, n) in [(512, 768, 768), (1024, 96, 96), (1024, 96, 288),
                      (2048, 128, 128)]:
        bf = run(m, k, n, jnp.bfloat16, jnp.float32)
        try:
            i8 = run(m, k, n, jnp.int8, jnp.int32)
            print(f"  int8 speedup: {i8/bf:.2f}x", flush=True)
        except Exception as e:
            print(f"  int8 FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
