"""Short real training run on TPU: full COCO-Stuff config on synthetic data;
verifies the fused-kernel training path (incl. the L=100 window backward
kernels) decreases the loss."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from diffusesg_tpu.config import load_config
from diffusesg_tpu.data import load_data
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params
from diffusesg_tpu.train import (create_train_state, make_optimizer,
                                 make_train_step, train_step_config_from)

cfg = load_config('configs/edm_diffuse_sg_regular_coco.yaml')
with cfg.unlocked():
    cfg.tpu.compute_dtype = 'bfloat16'
    cfg.tpu.use_pallas_attention = True
    cfg.dataset.subset = 64
bundle = load_data(cfg, data_root='/nonexistent')
model = build_model(cfg)
params = init_params(model, cfg, jax.random.PRNGKey(0))
opt = make_optimizer(2e-4, 1.0, 1)
state = create_train_state(params, [0.999], opt)
step = jax.jit(make_train_step(model.apply, opt, train_step_config_from(cfg)),
               donate_argnums=(0,))
B = 32
adjs = jnp.asarray(bundle.train.adjs[:B])
nodes = jnp.asarray(bundle.train.nodes[:B])
flags = jnp.asarray(bundle.train.node_flags[:B])
rng = jax.random.PRNGKey(1)
losses = []
t0 = time.time()
for i in range(120):
    rng, sub = jax.random.split(rng)
    state, m = step(state, sub, adjs, nodes, flags)
    if i % 20 == 0 or i == 119:
        la, lx = float(m['loss_adj']), float(m['loss_node'])
        losses.append((i, la, lx))
        print(f'step {i:4d} loss_adj {la:.4f} loss_node {lx:.4f}', flush=True)
print(f'total {time.time()-t0:.1f}s', flush=True)
first, last = losses[0][1], losses[-1][1]
ok = last < first and np.isfinite(last)
print(f'loss_adj {first:.4f} -> {last:.4f} ({"DECREASED" if ok else "FAILED"})')
sys.exit(0 if ok else 1)
