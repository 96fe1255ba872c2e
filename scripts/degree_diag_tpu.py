"""Degree-MMD sampling diagnostics (round-4 VERDICT item 7).

Measures WHERE topology error enters the sampling pipeline for a trained
checkpoint, instead of guessing the next lever:

1. per-interim-step decoded edge-count trace (the reference logs per-step
   edge counts during sampling, mcmc_sampler/edm.py:433-434; here the
   sampler's interim snapshots are decoded at each of the 10 capture
   points);
2. churn ablation: S_churn in {0, 10, 40 (default)} — does the stochastic
   re-noising move the final degree distribution?
3. decode-threshold sensitivity: shift the raw adj channels by +-delta
   before the bits decode (bit = sign) — how steep is the edge-count
   response at the decision boundary?

Run AFTER a quality run with the same QUALITY_* env:
  QUALITY_DIR=.quality/vg64 QUALITY_MAX_NODES=64 python scripts/degree_diag_tpu.py
One TPU process at a time.  Prints one JSON line per row.
"""
import sys, os, json, logging, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.WARNING)
import jax, jax.numpy as jnp, numpy as np
from quality_common import enable_compile_cache, load_quality_ckpt, quality_config
enable_compile_cache()
from diffusesg_tpu.data import load_data
from diffusesg_tpu.data.loader import split_eval_set
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.channels import resolve_sampling_channels
from diffusesg_tpu.sampling import get_mc_sampler
from diffusesg_tpu.sampling.orchestrator import make_sample_fn
from diffusesg_tpu.sampling.decode import decode_samples
from diffusesg_tpu.eval import SceneGraphEvaluator

OUT = os.environ.get("QUALITY_DIR", "/tmp/quality")
EVAL_N = int(os.environ.get("DIAG_EVAL_N", 256))
EMA_IDX = int(os.environ.get("DIAG_EMA_IDX", 0))
NUM_INTERIM = 10

cfg = quality_config(OUT)
with cfg.unlocked():
    cfg.mcmc.num_steps = int(os.environ.get("DIAG_STEPS", 100))
bundle = load_data(cfg, data_root="/nonexistent")
model = build_model(cfg)
params, ckpt_step, ema_beta, ckpt = load_quality_ckpt(OUT, EMA_IDX)
print(json.dumps({"tag": "setup", "ckpt": ckpt, "ckpt_step": ckpt_step,
                  "ema_beta": ema_beta,
                  "num_steps": cfg.mcmc.num_steps, "eval_n": EVAL_N}), flush=True)

info = resolve_sampling_channels(cfg)
eval_set = split_eval_set(bundle.test, EVAL_N, seed=cfg.seed)
flags_all = np.asarray(eval_set.node_flags).astype(bool)
gt_adj_types = np.stack([np.pad(np.asarray(g["edge_map"]),
                                [(0, flags_all.shape[1] - len(g["node_labels"]))] * 2)
                         for g in eval_set.pkl_data])
batch = cfg.test.batch_size
ev = SceneGraphEvaluator()

decode = jax.jit(lambda a, x, f: decode_samples(
    a, x, f, cfg.train.node_encoding, cfg.train.edge_encoding,
    info["raw_num_node_type"], info["raw_num_adj_type"], flag_bbox=True))

gt_edges_per_graph = float((gt_adj_types > 0).sum() / len(gt_adj_types))
# clamp so DIAG_EVAL_N smaller than the config's test batch still runs one
# full batch instead of breaking out before anything is sampled
batch = min(batch, EVAL_N, len(flags_all))

for s_churn in (40.0, 10.0, 0.0):
    sampler = dataclasses.replace(get_mc_sampler(cfg), S_churn=s_churn)
    fn = make_sample_fn(model, params, sampler, info["num_node_chan"],
                        info["num_adj_chan"], precond=cfg.mcmc.precond,
                        num_interim=NUM_INTERIM)
    rng = jax.random.PRNGKey(cfg.seed + 99)
    adjs, raws, interims, flags_used = [], [], [], []
    for i0 in range(0, (EVAL_N // batch) * batch or batch, batch):
        f = jnp.asarray(flags_all[i0:i0 + batch])
        if int(f.shape[0]) < batch:
            break
        rng, sub = jax.random.split(rng)
        a, x, ia, ix = fn(sub, f)
        dec = decode(a, x, f)
        adjs.append(np.asarray(dec.adj_types))
        raws.append(np.asarray(a))
        flags_used.append(np.asarray(f))
        # interim trace: decode edge counts at each snapshot (keep 8/batch)
        keep = 8
        ia_k, ix_k = np.asarray(ia[:, :keep]), np.asarray(ix[:, :keep])
        counts = []
        for t in range(ia_k.shape[0]):
            dt = decode(jnp.asarray(ia_k[t]), jnp.asarray(ix_k[t]), f[:keep])
            counts.append(float((np.asarray(dt.adj_types) > 0).sum() / keep))
        interims.append(counts)
    adj_cat = np.concatenate(adjs)
    fl_cat = np.concatenate(flags_used)
    n = len(adj_cat)
    deg = ev.compute_node_degree_mmd(adj_cat, gt_adj_types[:n], ["gaussian"])
    row = {"s_churn": s_churn,
           "degree_mmd": round(float(deg["gaussian"]["degree"]), 4),
           "gen_edges_per_graph": round(float((adj_cat > 0).sum() / n), 2),
           "gt_edges_per_graph": round(gt_edges_per_graph, 2),
           "interim_edge_trace": [round(c, 1) for c in
                                  np.mean(interims, axis=0).tolist()]}
    print(json.dumps({"tag": "churn_ablation", **row}), flush=True)

    if s_churn == 40.0:
        # decode-threshold sensitivity on the default-churn raw samples
        raw_cat = np.concatenate(raws)
        for delta in (-0.1, -0.05, 0.05, 0.1):
            dec = decode(jnp.asarray(raw_cat + delta),
                         jnp.zeros((n,) + (raw_cat.shape[1],) +
                                   (info["num_node_chan"],), np.float32),
                         jnp.asarray(fl_cat))
            at = np.asarray(dec.adj_types)
            d2 = ev.compute_node_degree_mmd(at, gt_adj_types[:n], ["gaussian"])
            print(json.dumps({
                "tag": "decode_threshold", "delta": delta,
                "degree_mmd": round(float(d2["gaussian"]["degree"]), 4),
                "gen_edges_per_graph": round(float((at > 0).sum() / n), 2)}),
                flush=True)
