import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from diffusesg_tpu.config import load_config
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params

cfg = load_config('configs/edm_diffuse_sg_regular_visual_genome.yaml')
with cfg.unlocked():
    cfg.tpu.compute_dtype = sys.argv[1] if len(sys.argv) > 1 else 'bfloat16'
    cfg.tpu.use_pallas_attention = len(sys.argv) > 2 and sys.argv[2] == '1'
model = build_model(cfg)
params = init_params(model, cfg, jax.random.PRNGKey(0))
B, N = 64, 64
adj = jnp.zeros((B, N, N))
node = jnp.zeros((B, N, 5))
flags = jnp.ones((B, N), dtype=bool)
cn = jnp.zeros((B,))

fwd = jax.jit(lambda a, x: model.apply(params, a, x, flags, cn))
o = fwd(adj, node); jax.block_until_ready(o)
t0=time.time()
for _ in range(10): o = fwd(adj, node)
jax.block_until_ready(o)
print(f'forward: {(time.time()-t0)/10*1000:.2f} ms')

# profile
import jax.profiler
jax.profiler.start_trace('/tmp/jaxtrace')
for _ in range(3): o = fwd(adj, node)
jax.block_until_ready(o)
jax.profiler.stop_trace()
print('trace written')
