import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp

# dispatch overhead
f0 = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 128))
f0(x).block_until_ready()
t0 = time.time()
for _ in range(50): y = f0(x)
y.block_until_ready()
print(f'tiny-op dispatch: {(time.time()-t0)/50*1000:.3f} ms/call')

# big matmul: 8192^3 * 2 = 1.1 TFLOP
a = jnp.ones((8192, 8192), jnp.bfloat16)
f1 = jax.jit(lambda a: a @ a)
f1(a).block_until_ready()
t0 = time.time()
for _ in range(10): y = f1(a)
y.block_until_ready()
dt = (time.time()-t0)/10
print(f'8192^3 bf16 matmul: {dt*1000:.2f} ms -> {2*8192**3/dt/1e12:.1f} TFLOP/s')

# medium matmul like the model's MLP: [262144, 96] x [96, 384]
m = jnp.ones((262144, 96), jnp.bfloat16)
w = jnp.ones((96, 384), jnp.bfloat16)
f2 = jax.jit(lambda m, w: m @ w)
f2(m, w).block_until_ready()
t0 = time.time()
for _ in range(20): y = f2(m, w)
y.block_until_ready()
dt = (time.time()-t0)/20
print(f'[262144,96]x[96,384]: {dt*1000:.3f} ms -> {2*262144*96*384/dt/1e12:.1f} TFLOP/s')

# chained 20 matmuls to amortize dispatch
def chain(m, w):
    for _ in range(20):
        m = (m @ w)[:, :96]
    return m
f3 = jax.jit(chain)
f3(m, w).block_until_ready()
t0 = time.time()
for _ in range(5): y = f3(m, w)
y.block_until_ready()
dt = (time.time()-t0)/5/20
print(f'chained: {dt*1000:.3f} ms per matmul -> {2*262144*96*384/dt/1e12:.1f} TFLOP/s')
