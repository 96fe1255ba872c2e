"""Time the VG train step with components ablated, on real TPU.

Ablation dimensions: self-conditioning (the p=0.5 extra no-grad forward),
the IoU auxiliary loss (reference: trainer_node_adj.py:130-159), and the
number of EMA trackers (reference default 5, learning_utils.py:145-166).
Attribution = full-step time minus ablated-step time.

Usage: python scripts/ablate_train_step.py  (env BENCH_BATCH, default 64)
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from diffusesg_tpu.config import load_config
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params
from diffusesg_tpu.train import (create_train_state, make_optimizer,
                                 make_train_step, train_step_config_from)

B = int(os.environ.get('BENCH_BATCH', 64))
REPS = int(os.environ.get('BENCH_STEPS', 30))


def build(self_cond: bool, iou: bool, n_ema: int):
    cfg = load_config('configs/edm_diffuse_sg_regular_visual_genome.yaml')
    with cfg.unlocked():
        cfg.tpu.compute_dtype = 'bfloat16'
        cfg.tpu.use_pallas_attention = True
        cfg.train.self_cond = self_cond
        if not iou:
            cfg.train.iou_loss_weight = 0.0
        cfg.train.ema_coef = list(cfg.train.ema_coef)[:n_ema] if n_ema else []
    model = build_model(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    opt = make_optimizer(2e-4, 1.0, 100)
    state = create_train_state(params, list(cfg.train.ema_coef), opt)
    step = jax.jit(make_train_step(model.apply, opt,
                                   train_step_config_from(cfg)),
                   donate_argnums=(0,))
    N = cfg.dataset.max_node_num
    rs = np.random.RandomState(0)
    adjs = jnp.asarray(rs.choice([-1., 0., 1.], (B, N, N)).astype(np.float32))
    nodes = jnp.asarray(rs.uniform(-1, 1, (B, N, 5)).astype(np.float32))
    flags = jnp.ones((B, N), dtype=bool)
    return state, step, (adjs, nodes, flags)


def timeit(name, self_cond=True, iou=True, n_ema=5):
    state, step, batch = build(self_cond, iou, n_ema)
    state, m = step(state, jax.random.PRNGKey(1), *batch)   # compile
    _ = float(m['loss'])
    t0 = time.time()
    for i in range(REPS):
        state, m = step(state, jax.random.PRNGKey(2 + i), *batch)
    _ = float(m['loss'])                                    # forced fetch
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{name:34s} {dt:7.2f} ms/step", flush=True)
    return dt


full = timeit("full (selfcond+iou+5ema)")
no_sc = timeit("no self-cond", self_cond=False)
no_iou = timeit("no IoU aux", iou=False)
e1 = timeit("1 EMA", n_ema=1)
e0 = timeit("0 EMA", n_ema=0)
print(f"attribution: self-cond {full-no_sc:+.2f}  iou {full-no_iou:+.2f}  "
      f"4 extra EMAs {full-e1:+.2f}  all 5 EMAs {full-e0:+.2f} ms")
