"""Conditional-completion QUALITY eval on TPU (round-4 VERDICT item 4).

Conditions the trained model on half of each test graph (the first
ceil(n/2) valid nodes: their labels, boxes, and the edges among them —
RePaint-style inpainting via sampling/edm_sampler `inpaint=`, the
generalization of the reference's init_adjs/init_nodes hooks,
/root/reference/DiffuseSG/runner/mcmc_sampler/edm.py:291-329) and verifies:

1. carried parts are EXACT after decode (known labels/edges/boxes match GT);
2. the COMPLETED halves are distributionally right: node-type / edge-type /
   degree MMD + bbox F1 of the held-out half-subgraphs against the GT
   held-out halves, compared to the same metrics for UNconditional samples.

Run AFTER scripts/train_quality_tpu.py with the same QUALITY_* env so the
checkpoint restores shape-exactly:
  QUALITY_DIR=/tmp/q_vg64 QUALITY_MAX_NODES=64 python scripts/eval_inpaint_quality_tpu.py
One TPU process at a time.  Prints one JSON line per row.
"""
import sys, os, json, logging
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.INFO)  # surface per-phase timings
import jax, jax.numpy as jnp, numpy as np
try:  # persistent compile cache (same knobs bench.py uses)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass
from quality_common import quality_config
from diffusesg_tpu.data import load_data
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.channels import resolve_sampling_channels
from diffusesg_tpu.sampling import get_mc_sampler
from diffusesg_tpu.sampling.orchestrator import make_sample_fn
from diffusesg_tpu.sampling.decode import decode_samples
from diffusesg_tpu.ops.box_ops import box_cxcywh_to_xyxy
from diffusesg_tpu.eval import SceneGraphEvaluator
from diffusesg_tpu.utils.checkpoint import restore_checkpoint
from diffusesg_tpu.train.train_state import ema_slice

OUT = os.environ.get("QUALITY_DIR", "/tmp/quality")
EVAL_N = int(os.environ.get("INPAINT_EVAL_N", 256))
EMA_IDX = int(os.environ.get("INPAINT_EMA_IDX", 0))  # 0 -> beta 0.999

cfg = quality_config(OUT)
with cfg.unlocked():
    cfg.mcmc.num_steps = int(os.environ.get("INPAINT_STEPS",
                                            cfg.mcmc.num_steps))
bundle = load_data(cfg, data_root="/nonexistent")
model = build_model(cfg)
payload = restore_checkpoint(os.path.join(OUT, "ckpt_final"))
params = ema_slice(payload["ema_params"], EMA_IDX)
beta = float(np.asarray(payload["ema_betas"])[EMA_IDX])
print(json.dumps({"tag": "setup", "ckpt_step": int(np.asarray(payload["step"])),
                  "ema_beta": beta, "num_steps": cfg.mcmc.num_steps,
                  "eval_n": EVAL_N}), flush=True)

info = resolve_sampling_channels(cfg)
sampler = get_mc_sampler(cfg)
batch = cfg.test.batch_size

# ---- build the conditioning task from the (encoded) test split ----
test = bundle.test
n_take = min(EVAL_N, len(test.adjs))
n_take = (n_take // batch) * batch or n_take
gt_adjs = np.asarray(test.adjs[:n_take], np.float32)
gt_nodes = np.asarray(test.nodes[:n_take], np.float32)
flags = np.asarray(test.node_flags[:n_take]).astype(bool)
n_pad = flags.shape[1]
n_valid = flags.sum(1)
# the first ceil(n/2) valid nodes are KNOWN (data is front-packed)
known = np.arange(n_pad)[None, :] < np.ceil(n_valid / 2)[:, None]
known &= flags
ho = flags & ~known                     # held-out (to-complete) nodes
mask_x = known
mask_a = known[:, :, None] & known[:, None, :]

sample_uncond = make_sample_fn(model, params, sampler, info["num_node_chan"],
                               info["num_adj_chan"], precond=cfg.mcmc.precond)
sample_cond = make_sample_fn(model, params, sampler, info["num_node_chan"],
                             info["num_adj_chan"], precond=cfg.mcmc.precond,
                             inpaint=True)

decode = jax.jit(lambda a, x, f: decode_samples(
    a, x, f, cfg.train.node_encoding, cfg.train.edge_encoding,
    info["raw_num_node_type"], info["raw_num_adj_type"], flag_bbox=True))

rows = {"cond": [], "uncond": [], "gt": []}
rng = jax.random.PRNGKey(cfg.seed + 77)
for i0 in range(0, n_take, batch):
    sl = slice(i0, i0 + batch)
    f = jnp.asarray(flags[sl])
    rng, r1, r2 = jax.random.split(rng, 3)
    a_c, x_c = sample_cond(r1, f, jnp.asarray(gt_adjs[sl]),
                           jnp.asarray(gt_nodes[sl]),
                           jnp.asarray(mask_a[sl]), jnp.asarray(mask_x[sl]))
    a_u, x_u = sample_uncond(r2, f)
    rows["cond"].append(jax.device_get(decode(a_c, x_c, f)))
    rows["uncond"].append(jax.device_get(decode(a_u, x_u, f)))
    rows["gt"].append(jax.device_get(decode(jnp.asarray(gt_adjs[sl]),
                                            jnp.asarray(gt_nodes[sl]), f)))
    print(json.dumps({"tag": "batch_done", "done": i0 + batch}), flush=True)

cat = lambda k, field: np.concatenate([np.asarray(getattr(d, field)) for d in rows[k]])
node_c, adj_c, bbox_c = cat("cond", "node_types"), cat("cond", "adj_types"), cat("cond", "bboxes")
node_u, adj_u, bbox_u = cat("uncond", "node_types"), cat("uncond", "adj_types"), cat("uncond", "bboxes")
node_g, adj_g, bbox_g = cat("gt", "node_types"), cat("gt", "adj_types"), cat("gt", "bboxes")

# ---- 1. exact-carry check (known parts reproduce GT bit-exactly) ----
carry = {
    "node_mismatch": int((node_c[known] != node_g[known]).sum()),
    "adj_mismatch": int((adj_c[mask_a] != adj_g[mask_a]).sum()),
    "bbox_max_err": float(np.abs((bbox_c - bbox_g)[known]).max()),
}
print(json.dumps({"tag": "carry_check", **carry}), flush=True)

# ---- 2. held-out-half metrics: completed vs GT held-out halves ----
ev = SceneGraphEvaluator()
kernels = ["gaussian"]
ho_pair = ho[:, :, None] & ho[:, None, :]


def heldout_metrics(tag, node, adj, bbox, flags_gen, ref_node, ref_adj,
                    ref_bbox, flags_ref):
    """Metrics over the held-out half-subgraphs: nodes restricted by flags,
    edges restricted to held-out x held-out pairs."""
    a = adj * ho_pair[: len(adj)]
    a_ref = ref_adj * ho_pair[: len(ref_adj)]
    m = {}
    deg = ev.compute_node_degree_mmd(a, a_ref, kernels)
    for kname, sub in deg.items():
        for key, val in sub.items():
            m[f"node_{key}_mmd_{kname}"] = val
    m.update({f"node_type_mmd_{k}": v for k, v in ev.compute_node_type_mmd(
        node, ref_node, flags_gen, flags_ref, info["raw_num_node_type"],
        kernels).items()})
    m.update({f"edge_type_mmd_{k}": v for k, v in ev.compute_edge_type_mmd(
        a, a_ref, flags_gen, flags_ref, info["raw_num_adj_type"],
        kernels).items()})
    bb = np.clip(np.asarray(box_cxcywh_to_xyxy(jnp.asarray(bbox))), 0, 1)
    bb_ref = np.clip(np.asarray(box_cxcywh_to_xyxy(jnp.asarray(ref_bbox))), 0, 1)
    mat = ev.compute_bbox_f1(bb, node, flags_gen, bb_ref, ref_node, flags_ref)
    m["vanilla_f1_avg_max"] = float(mat[..., 0].max(-1).mean())
    print(json.dumps({"tag": tag, **{k: round(float(v), 4)
                                     for k, v in m.items()}}), flush=True)
    return m


# floor: the GT held-out halves split in two iid halves against each other
h = len(node_g) // 2
heldout_metrics("gt_split_floor", node_g[:h], adj_g[:h], bbox_g[:h], ho[:h],
                node_g[h:], adj_g[h:], bbox_g[h:], ho[h:])
m_c = heldout_metrics("cond_completed_vs_gt_heldout", node_c, adj_c, bbox_c,
                      ho, node_g, adj_g, bbox_g, ho)
m_u = heldout_metrics("uncond_vs_gt_heldout", node_u, adj_u, bbox_u, ho,
                      node_g, adj_g, bbox_g, ho)


# ---- 3. PAIRED per-graph metrics: completed half of graph i vs the GT
# held-out half of the SAME graph i.  The distributional rows above cannot
# separate cond from uncond when graph halves are independent (a perfect
# unconditional model matches the marginal); the paired scores measure
# whether the sampler USED the known half.  With within-graph correlation
# in the data (QUALITY_SYNTH_ALPHA, data/synthetic.py) conditional must
# win; without it both tie at the marginal — that tie is the null result,
# not a bug.  (Reference surface: init_adjs/init_nodes conditioning,
# /root/reference/DiffuseSG/runner/mcmc_sampler/edm.py:291-329.)
def paired_metrics(tag, node, adj, bbox):
    K = info["raw_num_node_type"]
    E = info["raw_num_adj_type"]
    d_type, d_edge, d_area = [], [], []
    for i in range(len(node)):
        m = ho[i]
        if m.sum() == 0:
            continue
        h_c = np.bincount(node[i][m], minlength=K) / m.sum()
        h_g = np.bincount(node_g[i][m], minlength=K) / m.sum()
        d_type.append(0.5 * np.abs(h_c - h_g).sum())
        mp = ho_pair[i]
        e_c = adj[i][mp].astype(np.int64)
        e_g = adj_g[i][mp].astype(np.int64)
        if (e_g > 0).any() or (e_c > 0).any():
            he_c = np.bincount(e_c[e_c > 0], minlength=E)
            he_g = np.bincount(e_g[e_g > 0], minlength=E)
            he_c = he_c / max(he_c.sum(), 1)
            he_g = he_g / max(he_g.sum(), 1)
            d_edge.append(0.5 * np.abs(he_c - he_g).sum())
        area_c = (bbox[i][m][:, 2] * bbox[i][m][:, 3]).mean()
        area_g = (bbox_g[i][m][:, 2] * bbox_g[i][m][:, 3]).mean()
        d_area.append(abs(float(area_c - area_g)))
    m = {"paired_type_hist_l1": float(np.mean(d_type)),
         "paired_edge_hist_l1": float(np.mean(d_edge)) if d_edge else -1.0,
         "paired_area_err": float(np.mean(d_area))}
    print(json.dumps({"tag": tag, **{k: round(v, 4) for k, v in m.items()}}),
          flush=True)
    return m


p_c = paired_metrics("paired_cond", node_c, adj_c, bbox_c)
p_u = paired_metrics("paired_uncond", node_u, adj_u, bbox_u)

paired_wins = sum(1 for k in p_c if p_c[k] >= 0 and p_c[k] < p_u[k])
dist_wins = sum(1 for k in ("node_type_mmd_gaussian", "edge_type_mmd_gaussian",
                            "node_degree_mmd_gaussian")
                if m_c.get(k, 1) < m_u.get(k, 1))
dist_wins += int(m_c["vanilla_f1_avg_max"] > m_u["vanilla_f1_avg_max"])
print(json.dumps({"tag": "summary", "paired_cond_wins": paired_wins,
                  "paired_of": 3, "dist_cond_wins": dist_wins, "dist_of": 4,
                  "carry_exact": carry["node_mismatch"] == 0
                  and carry["adj_mismatch"] == 0
                  and carry["bbox_max_err"] < 1e-5}), flush=True)
