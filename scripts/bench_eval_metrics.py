"""Wall-clock of the evaluation metric suite: ours vs the PyTorch reference.

Runs the headline metric computations on IDENTICAL inputs — B generated +
B ground-truth VG-sized scene graphs (N=64 padding, 150/51 types) from the
synthetic generator — through both implementations:

  * this repo's vectorized / native-C++ evaluators (eval/sg_evaluator.py,
    eval/voc_f1.py + eval/native, eval/graph_stats.py, eval/blt.py)
  * the reference's evaluators imported live from /root/reference
    (evaluation/bbox_metrics.py with its mp.Pool fan-out, evaluation/stats.py
    networkx degree path), pyemd stubbed with the exact 1-D closed form.

The values are asserted to agree (the same checks as tests/test_eval.py)
so the timing compares equal work.  Usage:

    python scripts/bench_eval_metrics.py [B] [--skip-ref]
"""
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 64
SKIP_REF = "--skip-ref" in sys.argv
N, NUM_NODE_T, NUM_EDGE_T = 64, 150, 51
REF = "/root/reference/DiffuseSG"

# ---------------------------------------------------------------- inputs
from diffusesg_tpu.data.synthetic import synthetic_scene_graphs

def _pack(records):
    nt = np.zeros((len(records), N), np.int64)
    et = np.zeros((len(records), N, N), np.int64)
    fl = np.zeros((len(records), N), bool)
    bb = np.zeros((len(records), N, 4), np.float64)
    for i, r in enumerate(records):
        n = len(r["node_labels"])
        nt[i, :n] = r["node_labels"]
        et[i, :n, :n] = r["edge_map"]
        fl[i, :n] = True
        xc, yc, w, h = r["node_bboxes_xcyc"].T
        # xyxy, like the orchestrator hands the evaluator
        bb[i, :n] = np.stack([xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2], -1)
    return nt, et, fl, bb

gen = _pack(synthetic_scene_graphs(B, N, NUM_NODE_T, NUM_EDGE_T, seed=1, min_nodes=4))
ref = _pack(synthetic_scene_graphs(B, N, NUM_NODE_T, NUM_EDGE_T, seed=2, min_nodes=4))
(g_nt, g_et, g_fl, g_bb), (r_nt, r_et, r_fl, r_bb) = gen, ref

results = {}

def _timed(name, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    results[name] = (dt, out)
    print(f"{name:42s} {dt:9.3f} s", flush=True)
    return out

# ---------------------------------------------------------------- ours
print(f"== diffusesg_tpu evaluators (B={B} gen x {B} gt, N={N})")
from diffusesg_tpu.eval import SceneGraphEvaluator as Ev

_timed("ours/bbox_f1 (all-pairs VOC, 10 IoUs)",
       lambda: Ev.compute_bbox_f1(g_bb, g_nt, g_fl, r_bb, r_nt, r_fl))
_timed("ours/degree_mmd",
       lambda: Ev.compute_node_degree_mmd(g_et, r_et, ["gaussian"]))
_timed("ours/node_type_mmd",
       lambda: Ev.compute_node_type_mmd(g_nt, r_nt, g_fl, r_fl, NUM_NODE_T, ["gaussian"]))
_timed("ours/edge_type_mmd",
       lambda: Ev.compute_edge_type_mmd(g_et, r_et, g_fl, r_fl, NUM_EDGE_T, ["gaussian"]))
_timed("ours/blt_ioa x4",
       lambda: [Ev.compute_bbox_ioa(g_bb, g_fl, return_mean=True, **{f: True})
                for f in ("flag_vanilla_iou", "flag_perceptual_iou",
                          "flag_overlap", "flag_alignment")])

if SKIP_REF:
    sys.exit(0)

# ---------------------------------------------------------------- reference
def _install_pyemd_stub():
    if "pyemd" in sys.modules:
        return
    stub = types.ModuleType("pyemd")
    stub.emd = lambda x, y, d: float(np.abs(np.cumsum(x - y)).sum()) * \
        (d[0, 1] if d.shape[0] > 1 else 1.0)
    sys.modules["pyemd"] = stub

_install_pyemd_stub()
import networkx as nx
if not hasattr(nx, "from_numpy_matrix"):  # removed in networkx 3.x
    nx.from_numpy_matrix = nx.from_numpy_array
sys.path.insert(0, REF)
import importlib
bbox_metrics = importlib.import_module("evaluation.bbox_metrics")
REv = bbox_metrics.SceneGraphEvaluator

print(f"== reference evaluators (same inputs, {os.cpu_count()} CPU)")
import torch
tg_nt, tg_et, tg_fl = map(torch.from_numpy, (g_nt, g_et, g_fl))
tr_nt, tr_et, tr_fl = map(torch.from_numpy, (r_nt, r_et, r_fl))

ref_f1 = _timed("ref/bbox_f1 (mp.Pool all-pairs VOC)",
                lambda: REv.compute_bbox_f1(g_bb, g_nt, g_fl, r_bb, r_nt, r_fl))
ref_deg = _timed("ref/degree_mmd (networkx)",
                 lambda: REv.compute_node_degree_mmd(tg_et, tr_et, ["gaussian"]))
ref_ntm = _timed("ref/node_type_mmd",
                 lambda: REv.compute_node_type_mmd(tg_nt, tr_nt, tg_fl, tr_fl,
                                                   NUM_NODE_T, ["gaussian"]))
ref_etm = _timed("ref/edge_type_mmd",
                 lambda: REv.compute_edge_type_mmd(tg_et, tr_et, tg_fl, tr_fl,
                                                   NUM_EDGE_T, ["gaussian"]))
_timed("ref/blt_ioa x4",
       lambda: [REv.compute_bbox_ioa(g_bb, g_fl, return_mean=True, **{f: True})
                for f in ("flag_vanilla_iou", "flag_perceptual_iou",
                          "flag_overlap", "flag_alignment")])

# ---------------------------------------------------------------- agreement
ours_f1 = results["ours/bbox_f1 (all-pairs VOC, 10 IoUs)"][1]
np.testing.assert_allclose(np.asarray(ours_f1).squeeze(), np.asarray(ref_f1).squeeze(),
                           atol=1e-8)
ours_deg = results["ours/degree_mmd"][1]["gaussian"]["degree"]
np.testing.assert_allclose(ours_deg, ref_deg["gaussian"]["degree"], rtol=1e-6)
np.testing.assert_allclose(results["ours/node_type_mmd"][1]["gaussian"],
                           ref_ntm["gaussian"], rtol=1e-6)
np.testing.assert_allclose(results["ours/edge_type_mmd"][1]["gaussian"],
                           ref_etm["gaussian"], rtol=1e-6)
print("values agree.")

print("\nspeedups (ref / ours):")
for name in list(results):
    if name.startswith("ours/"):
        key = name.split("/")[1].split(" ")[0]
        match = [r for r in results if r.startswith("ref/") and key.split("_")[0] in r]
        if match:
            print(f"  {key:20s} {results[match[0]][0] / results[name][0]:8.1f}x")
