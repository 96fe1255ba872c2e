import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from diffusesg_tpu.config import load_config
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params

cfg = load_config('configs/edm_diffuse_sg_regular_visual_genome.yaml')
with cfg.unlocked():
    cfg.tpu.compute_dtype = 'bfloat16'
    cfg.tpu.use_pallas_attention = False
m_xla = build_model(cfg)
with cfg.unlocked():
    cfg.tpu.use_pallas_attention = True
m_pal = build_model(cfg)
params = init_params(m_xla, cfg, jax.random.PRNGKey(0))
B, N = 64, 64
rs = np.random.RandomState(0)
adj = jnp.asarray(rs.randn(B, N, N).astype(np.float32))
node = jnp.asarray(rs.randn(B, N, 5).astype(np.float32))
flags = jnp.ones((B, N), dtype=bool)
cn = jnp.zeros((B,))

f_xla = jax.jit(lambda a, x: m_xla.apply(params, a, x, flags, cn))
f_pal = jax.jit(lambda a, x: m_pal.apply(params, a, x, flags, cn))
o1 = f_xla(adj, node); o2 = f_pal(adj, node)
jax.block_until_ready((o1, o2))
err_a = float(jnp.abs(o1[0]-o2[0]).max()); err_x = float(jnp.abs(o1[1]-o2[1]).max())
print(f'max err adj {err_a:.5f} node {err_x:.5f}', flush=True)
for name, f in [('xla', f_xla), ('pallas', f_pal)]:
    r = f(adj, node); _ = np.asarray(r[0][0,0,:2])
    t0 = time.time()
    iters = 10
    for _ in range(iters): r = f(adj, node)
    _ = np.asarray(r[0][0,0,:2])
    print(f'{name} forward: {(time.time()-t0)/iters*1000:.2f} ms', flush=True)
