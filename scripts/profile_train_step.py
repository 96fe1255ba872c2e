"""Trace the VG training step on TPU and dump the top-op breakdown.

The step measures 86.8 ms at batch 64 while fwd(15.5) + 0.5*selfcond(7.8)
+ ~2x fwd backward(31) only accounts for ~54 ms — this finds where the
rest goes (EMA/Adam tree passes, loss, resample vjps, readout bwd...).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from diffusesg_tpu.config import load_config
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params
from diffusesg_tpu.train import (create_train_state, make_optimizer,
                                 make_train_step, train_step_config_from)

cfg = load_config('configs/edm_diffuse_sg_regular_visual_genome.yaml')
with cfg.unlocked():
    cfg.tpu.compute_dtype = 'bfloat16'
    cfg.tpu.use_pallas_attention = True
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

state, m = step(state, jax.random.PRNGKey(1), adjs, nodes, flags)
_ = float(m['loss'])
trace_dir = '/tmp/jaxtrace_train'
jax.profiler.start_trace(trace_dir)
for i in range(4):
    state, m = step(state, jax.random.PRNGKey(2 + i), adjs, nodes, flags)
_ = float(m['loss'])
jax.profiler.stop_trace()
print('trace written to', trace_dir, flush=True)
os.system(f'{sys.executable} {os.path.dirname(os.path.abspath(__file__))}/analyze_trace.py {trace_dir} 40')
