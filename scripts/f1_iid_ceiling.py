"""Matched-size iid-split ceiling for the bbox-F1 metrics (CPU-only).

`*_f1_avg_max` (reference: DiffuseSG/evaluation/bbox_metrics.py:379-440,
wired sampler_node_adj.py:507-552) compares GENERATED layouts against GT
layouts pairwise; the GT-sanity row (gen==GT) trivially scores ~0.96 and is
NOT the achievable level for a non-memorizing model.  The fair ceiling is a
fresh iid draw from the SAME population (shared pop_seed,
data/synthetic.py) scored against the test split at the eval's exact sizes.
Quality tables in BASELINE.md cite these ceilings next to the trained rows.

Run: QUALITY_MAX_NODES=64 python scripts/f1_iid_ceiling.py   (any QUALITY_* env)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")   # metrics only — never touch the TPU
import jax.numpy as jnp

from quality_common import quality_config
from diffusesg_tpu.data import load_data
from diffusesg_tpu.data.synthetic import synthetic_scene_graphs
from diffusesg_tpu.models.channels import dataset_constants
from diffusesg_tpu.eval import SceneGraphEvaluator
from diffusesg_tpu.ops.box_ops import box_cxcywh_to_xyxy

cfg = quality_config("/tmp/qcfg_ceiling")
bundle = load_data(cfg, data_root="/nonexistent")
pkl = bundle.test.pkl_data
K_n, K_e, _num_allowed = dataset_constants(cfg.dataset.name)
fresh = synthetic_scene_graphs(
    # node counts clamped like synthetic_bundle_dicts (min with num_allowed,
    # 62 for VG at N=64) so the draw really is the bundle's population
    len(pkl), min(cfg.dataset.max_node_num, _num_allowed), K_n, K_e,
    seed=cfg.seed + 2, pop_seed=cfg.seed,
    # the fresh draw must come from the SAME population: forward the
    # clustering/concentration knobs the bundle was built with
    per_graph_alpha=cfg.dataset.get("synthetic_per_graph_alpha", None),
    node_alpha=float(cfg.dataset.get("synthetic_node_alpha", 0.3)),
    edge_alpha=float(cfg.dataset.get("synthetic_edge_alpha", 0.5)))
n_pad = cfg.dataset.max_node_num


def pack(data):
    B = len(data)
    ty = np.zeros((B, n_pad), np.int64)
    fl = np.zeros((B, n_pad), bool)
    bb = np.zeros((B, n_pad, 4), np.float32)
    for i, g in enumerate(data):
        n = len(g["node_labels"])
        ty[i, :n] = g["node_labels"]
        fl[i, :n] = True
        bb[i, :n] = g["node_bboxes_xcyc"]
    xy = np.clip(np.asarray(box_cxcywh_to_xyxy(jnp.asarray(bb))), 0, 1)
    return ty, fl, xy


ty_g, fl_g, xy_g = pack(fresh)
ty_t, fl_t, xy_t = pack(pkl)
ev = SceneGraphEvaluator()
area_stat, freq_stat = bundle.bbox_area_stat, bundle.bbox_freq_stat
w_area = np.asarray([area_stat[k] for k in sorted(area_stat)], np.float64)
w_area /= w_area.sum()
w_freq = np.asarray([freq_stat[k] for k in sorted(freq_stat)], np.float64)
w_freq /= w_freq.sum()
mat = ev.compute_bbox_f1(xy_g, ty_g, fl_g, xy_t, ty_t, fl_t,
                         class_weight_ls=[np.ones_like(w_area), w_area, w_freq])
mat_nt = ev.compute_bbox_f1(xy_g, np.ones_like(ty_g) * fl_g, fl_g,
                            xy_t, np.ones_like(ty_t) * fl_t, fl_t)
for nm, m in [("vanilla", mat[..., 0]), ("area", mat[..., 1]),
              ("freq", mat[..., 2]), ("no_node_type", mat_nt[..., 0])]:
    print(f"{nm}_f1_avg_max iid ceiling ({len(ty_g)}v{len(ty_t)}, "
          f"N={n_pad}, {cfg.dataset.name}): {m.max(-1).mean():.4f}")
