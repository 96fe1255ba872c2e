"""Conditional completion (masked inpainting) on TPU — BASELINE config 4.

Measures 1000-step Heun sampling with RePaint-style inpainting
(sampling/edm_sampler.py `inpaint=` — the generalization of the reference's
init_adjs/init_nodes hooks, /root/reference/DiffuseSG/runner/mcmc_sampler/
edm.py:291-329) against the unconditional path on the VG full config, and
verifies on-device that every known entry is carried through exactly.

Prints one JSON line per measurement.  Run: python scripts/bench_inpaint_tpu.py
(one TPU process at a time).  Env: BENCH_STEPS/BENCH_BATCH as in bench.py.
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from diffusesg_tpu.config import load_config
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params
from diffusesg_tpu.models.precond import precond_forward
from diffusesg_tpu.models.channels import get_node_adj_num_type
from diffusesg_tpu.sampling import get_mc_sampler

STEPS = int(os.environ.get("BENCH_STEPS", 1000))
BATCH = int(os.environ.get("BENCH_BATCH", 64))

cfg = load_config("configs/edm_diffuse_sg_regular_visual_genome.yaml")
with cfg.unlocked():
    cfg.mcmc.num_steps = STEPS
    cfg.tpu.compute_dtype = "bfloat16"
    cfg.tpu.use_pallas_attention = jax.default_backend() == "tpu"

model = build_model(cfg)
params = init_params(model, cfg, jax.random.PRNGKey(0))
sampler = get_mc_sampler(cfg)
n = cfg.dataset.max_node_num
flags = jnp.ones((BATCH, n), dtype=bool)
ch = get_node_adj_num_type(cfg.dataset.name, flag_sg=True,
                           encoding=cfg.train.node_encoding,
                           edge_encoding=cfg.train.edge_encoding)
n_node_ch, n_edge_ch = ch["num_node_type"], ch["num_adj_type"]


def denoiser(a, x, sigmas, sc_a, sc_x):
    def model_fn(aa, xx, f, c_noise, s_a, s_x):
        return model.apply(params, aa, xx, f, c_noise, s_a, s_x)
    return precond_forward(model_fn, "edm", a, x, flags, sigmas, sc_a, sc_x)


# a completion task: the first half of the nodes (labels+bboxes) and the
# edges among them are KNOWN; the sampler must fill in the rest
rs = np.random.RandomState(0)
adj_shape = (BATCH, n, n) if n_edge_ch == 1 else (BATCH, n, n, n_edge_ch)
gt_adjs = jnp.asarray(rs.uniform(-1, 1, adj_shape).astype(np.float32))
gt_adjs = 0.5 * (gt_adjs + jnp.swapaxes(gt_adjs, 1, 2))
gt_nodes = jnp.asarray(rs.uniform(-1, 1, (BATCH, n, n_node_ch)).astype(np.float32))
known = np.zeros((BATCH, n), dtype=bool)
known[:, : n // 2] = True
mask_nodes = jnp.asarray(known)
mask_adjs = jnp.asarray(known[:, :, None] & known[:, None, :])
inpaint = dict(gt_adjs=gt_adjs, gt_nodes=gt_nodes,
               mask_adjs=mask_adjs, mask_nodes=mask_nodes)


def _force(o):
    jax.block_until_ready(o)
    return float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])


def timed(fn, label):
    t0 = time.time()
    _force(fn(jax.random.PRNGKey(1)))
    compile_s = time.time() - t0
    t0 = time.time()
    out = fn(jax.random.PRNGKey(2))
    _force(out)
    run_s = time.time() - t0
    n_evals = 2 * STEPS - 1
    print(json.dumps({
        "metric": f"graphs_per_sec_per_chip_{label}",
        "value": round(BATCH / run_s * (STEPS / 1000.0), 4),
        "unit": "graphs/s/chip",
        "p50_denoise_eval_ms": round(run_s / n_evals * 1000, 3),
        "batch": BATCH, "num_steps": STEPS,
        "compile_s": round(compile_s, 1), "run_s": round(run_s, 2),
    }), flush=True)
    return out


uncond = jax.jit(lambda r: sampler.sample(denoiser, r, flags, n_node_ch,
                                          n_edge_ch))
inp = jax.jit(lambda r: sampler.sample(denoiser, r, flags, n_node_ch,
                                       n_edge_ch, inpaint=inpaint))

timed(uncond, "unconditional")
adjs, nodes = timed(inp, "inpaint_completion")

ma, mx = np.asarray(mask_adjs, bool), np.asarray(mask_nodes, bool)
a_np, x_np = np.asarray(adjs, np.float32), np.asarray(nodes, np.float32)
err_a = float(np.abs(a_np[ma] - np.asarray(gt_adjs)[ma]).max())
err_x = float(np.abs(x_np[mx] - np.asarray(gt_nodes)[mx]).max())
moved_a = float(np.abs(a_np[~ma] - np.asarray(gt_adjs)[~ma]).mean())
assert err_a < 1e-2 and err_x < 1e-2, (err_a, err_x)  # bf16 carry
assert moved_a > 0.1  # unknown entries actually sampled
print(json.dumps({"metric": "inpaint_known_entry_max_err",
                  "adj": round(err_a, 6), "node": round(err_x, 6),
                  "unknown_adj_mean_dev_from_gt": round(moved_a, 4)}),
      flush=True)
