import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

a = jnp.asarray(np.random.rand(8192, 8192), jnp.bfloat16)
f1 = jax.jit(lambda a: a @ a)
r = f1(a); _ = np.asarray(r[0, :2])  # warmup + fetch
t0 = time.time()
iters = 10
for _ in range(iters):
    r = f1(r)
_ = np.asarray(r[0, :2])  # force the whole chain
dt = (time.time()-t0)/iters
print(f'8192^3 bf16 chained matmul: {dt*1000:.2f} ms -> {2*8192**3/dt/1e12:.1f} TFLOP/s')

m = jnp.asarray(np.random.rand(262144, 96), jnp.bfloat16)
w = jnp.asarray(np.random.rand(96, 96), jnp.bfloat16)
def chain(m, w):
    for _ in range(50):
        m = m @ w
    return m
f3 = jax.jit(chain)
r = f3(m, w); _ = np.asarray(r[0, :2])
t0 = time.time()
r = f3(m, w); _ = np.asarray(r[0, :2])
dt = (time.time()-t0)/50
print(f'[262144,96]x[96,96] in-jit chain: {dt*1000:.3f} ms per matmul -> {2*262144*96*96/dt/1e12:.1f} TFLOP/s')
