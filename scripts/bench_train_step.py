"""Training-step throughput on the real TPU (full VG config, batch 64)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from diffusesg_tpu.config import load_config
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params
from diffusesg_tpu.train import (TrainStepConfig, create_train_state,
                                 make_optimizer, make_train_step,
                                 train_step_config_from)

cfg = load_config('configs/edm_diffuse_sg_regular_visual_genome.yaml')
with cfg.unlocked():
    cfg.tpu.compute_dtype = 'bfloat16'
    cfg.tpu.use_pallas_attention = os.environ.get('BENCH_PALLAS', '1') == '1'
B = int(os.environ.get('BENCH_BATCH', 64))
model = build_model(cfg)
params = init_params(model, cfg, jax.random.PRNGKey(0))
opt = make_optimizer(2e-4, 1.0, 100)
state = create_train_state(params, list(cfg.train.ema_coef), opt)
step = jax.jit(make_train_step(model.apply, opt, train_step_config_from(cfg)),
               donate_argnums=(0,))
rs = np.random.RandomState(0)
N = cfg.dataset.max_node_num
adjs = jnp.asarray(rs.choice([-1., 0., 1.], (B, N, N)).astype(np.float32))
nodes = jnp.asarray(rs.uniform(-1, 1, (B, N, 5)).astype(np.float32))
flags = jnp.ones((B, N), dtype=bool)

t0 = time.time()
state, m = step(state, jax.random.PRNGKey(1), adjs, nodes, flags)
print('compile+first step %.1fs loss=%.4f' % (time.time()-t0, float(m['loss'])), flush=True)
iters = 10
t0 = time.time()
for i in range(iters):
    state, m = step(state, jax.random.PRNGKey(2+i), adjs, nodes, flags)
_ = float(m['loss'])
dt = (time.time()-t0)/iters
print(f'train step: {dt*1000:.1f} ms -> {B/dt:.1f} graphs/s/chip training throughput', flush=True)
