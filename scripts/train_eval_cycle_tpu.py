"""Full cycle on TPU: train on synthetic VG, sample, evaluate metrics.
Demonstrates end-to-end learning: trained metrics must beat untrained."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from diffusesg_tpu.config import load_config
from diffusesg_tpu.data import load_data, Batches
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params
from diffusesg_tpu.sampling import get_mc_sampler
from diffusesg_tpu.sampling.orchestrator import sg_go_sampling
from diffusesg_tpu.train import (create_train_state, make_optimizer,
                                 make_train_step, train_step_config_from)
from diffusesg_tpu.train.train_state import ema_slice

cfg = load_config('configs/edm_diffuse_sg_regular_visual_genome.yaml')
with cfg.unlocked():
    cfg.exp_dir = '/tmp/cycle'
    cfg.logdir = '/tmp/cycle/run'
    cfg.tpu.compute_dtype = 'bfloat16'
    cfg.tpu.use_pallas_attention = True
    cfg.dataset.max_node_num = 16    # small graphs -> fast steps, real learning
    cfg.dataset.subset = 256
    cfg.train.batch_size = 64
    cfg.test.batch_size = 64
    cfg.test.eval_size = 128
    cfg.mcmc.num_steps = 100
os.makedirs('/tmp/cycle/run', exist_ok=True)
bundle = load_data(cfg, data_root='/nonexistent')
model = build_model(cfg)
params = init_params(model, cfg, jax.random.PRNGKey(0))
opt = make_optimizer(4e-4, 1.0, 4)
state = create_train_state(params, [0.999], opt)
step = jax.jit(make_train_step(model.apply, opt, train_step_config_from(cfg)),
               donate_argnums=(0,))
sampler = get_mc_sampler(cfg)

m0 = sg_go_sampling(model, params, sampler, cfg, bundle, epoch=0)
print('UNTRAINED:', json.dumps({k: round(float(v), 4) for k, v in m0.items()
      if isinstance(v, (int, float)) and 'mmd' in k or 'triplet_tv_dist_full_val' in k}), flush=True)

batches = Batches(bundle.train, 64, shuffle=True, seed=0)
rng = jax.random.PRNGKey(1)
t0 = time.time()
steps_done = 0
for epoch in range(400):
    batches.set_epoch(epoch)
    for adjs, nodes, flags, _ in batches:
        rng, sub = jax.random.split(rng)
        state, m = step(state, sub, jnp.asarray(adjs), jnp.asarray(nodes),
                        jnp.asarray(flags))
        steps_done += 1
    if epoch % 100 == 0:
        print(f'epoch {epoch} steps {steps_done} loss_adj {float(m["loss_adj"]):.4f} '
              f'({time.time()-t0:.0f}s)', flush=True)
print(f'trained {steps_done} steps in {time.time()-t0:.0f}s', flush=True)

ema_params = ema_slice(jax.device_get(state.ema_params), -1)
m1 = sg_go_sampling(model, ema_params, sampler, cfg, bundle, epoch=1)
print('TRAINED:', json.dumps({k: round(float(v), 4) for k, v in m1.items()
      if isinstance(v, (int, float)) and 'mmd' in k or 'triplet_tv_dist_full_val' in k}), flush=True)
for key in ['node_type_mmd_gaussian', 'edge_type_mmd_gaussian', 'node_degree_mmd_gaussian']:
    print(f'{key}: untrained {m0[key]:.4f} -> trained {m1[key]:.4f} '
          f'{"IMPROVED" if m1[key] < m0[key] else "no"}', flush=True)
