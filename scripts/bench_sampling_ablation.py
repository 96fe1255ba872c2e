import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, sys
import jax, jax.numpy as jnp
from diffusesg_tpu.config import load_config
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params
from diffusesg_tpu.models.precond import precond_forward
from diffusesg_tpu.sampling import get_mc_sampler

dtype, pallas = sys.argv[1], sys.argv[2] == '1'
cfg = load_config('configs/edm_diffuse_sg_regular_visual_genome.yaml')
with cfg.unlocked():
    cfg.mcmc.num_steps = 50
    cfg.tpu.compute_dtype = dtype
    cfg.tpu.use_pallas_attention = pallas
model = build_model(cfg)
params = init_params(model, cfg, jax.random.PRNGKey(0))
sampler = get_mc_sampler(cfg)
B, N = 64, 64
flags = jnp.ones((B, N), dtype=bool)

def denoiser(a, x, sigmas, sc_a, sc_x):
    def model_fn(aa, xx, f, c_noise, s_a, s_x):
        return model.apply(params, aa, xx, f, c_noise, s_a, s_x)
    return precond_forward(model_fn, 'edm', a, x, flags, sigmas, sc_a, sc_x)

fn = jax.jit(lambda rng: sampler.sample(denoiser, rng, flags, 5, 1))
t0=time.time(); out = fn(jax.random.PRNGKey(1)); jax.block_until_ready(out)
print(f'{dtype} pallas={pallas} compile+run {time.time()-t0:.1f}s', flush=True)
for tag in ['run1','run2']:
    t0=time.time(); out = fn(jax.random.PRNGKey(2)); jax.block_until_ready(out); dt=time.time()-t0
    print(f'{dtype} pallas={pallas} {tag}: {dt:.3f}s per-eval {dt/99*1000:.2f}ms 1000-step {B/(dt*20):.3f} g/s/chip', flush=True)
