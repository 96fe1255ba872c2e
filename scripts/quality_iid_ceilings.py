"""Matched-size iid-draw ceilings for EVERY quality metric (CPU-only).

For the QUALITY_* env in effect, draws a fresh iid sample from the SAME
synthetic population (shared pop_seed + the same concentration/clustering
knobs) at the eval's exact size and scores it against the eval split through
the orchestrator's own metric block (evaluate_samples) — so the ceiling rows
are computed by the identical code path as the trained-model rows in
BASELINE.md (reference metric surface: sampler_node_adj.py:445-552).

The ceiling is what a PERFECT non-memorizing model would score; a trained
row AT the ceiling demonstrates distribution match, a row far ABOVE the
GT-sanity floor but far off this ceiling has not converged, and a bbox-F1
row far above the ceiling is the memorization signature (BASELINE.md r4).

Run: QUALITY_HELDOUT=1 QUALITY_MAX_NODES=64 ... python scripts/quality_iid_ceilings.py
"""
import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")   # metrics only — never touch the TPU

from quality_common import quality_config
from diffusesg_tpu.data import load_data
from diffusesg_tpu.data.loader import split_eval_set
from diffusesg_tpu.data.synthetic import synthetic_scene_graphs
from diffusesg_tpu.models.channels import dataset_constants
from diffusesg_tpu.sampling.orchestrator import evaluate_samples

cfg = quality_config(os.environ.get("QUALITY_DIR", "/tmp/qceil"))
bundle = load_data(cfg, data_root="/nonexistent")
K_n, K_e, num_allowed = dataset_constants(cfg.dataset.name)
n_pad = cfg.dataset.max_node_num
eval_size = min(cfg.test.eval_size or len(bundle.test), len(bundle.test))
eval_set = split_eval_set(bundle.test, eval_size, seed=cfg.seed)

fresh = synthetic_scene_graphs(
    # SAME population as the bundle: synthetic_bundle_dicts clamps node
    # counts to min(max_node_num, num_allowed) (62 for VG at N=64) — the
    # fresh draw must too, or ~3% of ceiling graphs carry node counts the
    # test split can never contain
    eval_size, min(n_pad, num_allowed), K_n, K_e,
    seed=cfg.seed + 2, pop_seed=cfg.seed,
    per_graph_alpha=cfg.dataset.get("synthetic_per_graph_alpha", None),
    node_alpha=float(cfg.dataset.get("synthetic_node_alpha", 0.3)),
    edge_alpha=float(cfg.dataset.get("synthetic_edge_alpha", 0.5)))


def pack(data):
    B = len(data)
    ty = np.zeros((B, n_pad), np.int64)
    ad = np.zeros((B, n_pad, n_pad), np.int64)
    fl = np.zeros((B, n_pad), bool)
    bb = np.zeros((B, n_pad, 4), np.float32)
    for i, g in enumerate(data):
        n = len(g["node_labels"])
        ty[i, :n] = g["node_labels"]
        ad[i, :n, :n] = g["edge_map"]
        fl[i, :n] = True
        bb[i, :n] = g["node_bboxes_xcyc"]
    return ty, ad, fl, bb


ty_g, ad_g, fl_g, bb_g = pack(fresh)
ty_t, ad_t, fl_t, bb_t = pack(eval_set.pkl_data)
res = {"q_adj": ad_g, "q_node": ty_g, "flags": fl_g, "bbox": bb_g,
       "q_adj_gt": ad_t, "q_node_gt": ty_t, "flags_gt": fl_t, "bbox_gt": bb_t}
metrics = evaluate_samples(res, cfg, bundle, K_n, K_e,
                           flag_node_only=False, flag_binary_edge=False,
                           flag_bbox=True, skip_eval=False)
row = {k: round(float(v), 4) for k, v in metrics.items()
       if not k.startswith("_") and isinstance(v, (int, float, np.floating))}
print(json.dumps({"tag": "iid_ceiling", **row}), flush=True)
