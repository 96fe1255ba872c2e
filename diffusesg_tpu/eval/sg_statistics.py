"""Dataset-vs-generated scene-graph statistics report.

Counterpart of the reference's compute_sg_statistics
(reference: DiffuseSG/utils/sg_utils.py:9-345, wired from
runner/sampler/sampler_node_adj.py:417-435): compares generated samples
against the raw dataset on node-count / edge-count / type / degree / bbox
distributions, writes a `generated_stats.png` dashboard plus a JSON summary.
"""
from __future__ import annotations

import json
import logging
import os

import numpy as np


def _graph_stats(adjs, node_types, flags, bboxes=None):
    """Per-set summary arrays from int tensors."""
    flags = np.asarray(flags).astype(bool)
    adjs = np.asarray(adjs)
    node_types = np.asarray(node_types)
    num_nodes = flags.sum(-1)
    num_edges = (adjs > 0).sum((-1, -2))
    node_hist = np.bincount(node_types[flags].astype(np.int64))
    edge_vals = []
    deg = []
    for i in range(len(adjs)):
        m = np.outer(flags[i], flags[i])
        vals = adjs[i][m]
        edge_vals.append(vals[vals > 0])
        und = ((adjs[i] > 0) | (adjs[i].T > 0)) & m
        np.fill_diagonal(und, False)
        deg.append(und.sum(-1)[flags[i]])
    edge_hist = np.bincount(np.concatenate(edge_vals).astype(np.int64)) \
        if edge_vals and sum(len(v) for v in edge_vals) else np.zeros(1)
    deg_all = np.concatenate(deg) if deg else np.zeros(1)
    out = {
        "num_nodes": num_nodes, "num_edges": num_edges,
        "node_hist": node_hist, "edge_hist": edge_hist, "degrees": deg_all,
    }
    if bboxes is not None:
        bb = np.asarray(bboxes)
        w = bb[..., 2][flags]
        h = bb[..., 3][flags]
        out["bbox_area"] = w * h
        out["bbox_aspect"] = w / np.maximum(h, 1e-6)
    return out


def compute_sg_statistics(result_data: dict, pkl_data: list, idx_to_word: dict,
                          save_dir: str) -> dict:
    """Build the comparison report.

    @param result_data: dict with samples_a/samples_x/samples_node_flags
        (+ optional samples_x_bbox), and gt_* counterparts — the same keys the
        sampling orchestrator saves to npz.
    @param pkl_data: raw dataset records (node_labels/edge_map/...)
    @return summary dict (also written to <save_dir>/generated_stats.json)
    """
    os.makedirs(save_dir, exist_ok=True)
    gen = _graph_stats(result_data["samples_a"], result_data.get("samples_x", 0 * result_data["samples_a"][..., 0]),
                       result_data["samples_node_flags"],
                       result_data.get("samples_x_bbox"))
    gt = _graph_stats(result_data["gt_a"], result_data.get("gt_x", 0 * result_data["gt_a"][..., 0]),
                      result_data["gt_node_flags"], result_data.get("gt_x_bbox"))

    summary = {}
    for tag, s in [("gen", gen), ("gt", gt)]:
        summary[tag] = {
            "num_graphs": int(len(s["num_nodes"])),
            "avg_nodes": float(s["num_nodes"].mean()),
            "avg_edges": float(s["num_edges"].mean()),
            "avg_degree": float(s["degrees"].mean()),
            "distinct_node_types": int((s["node_hist"] > 0).sum()),
            "distinct_edge_types": int((s["edge_hist"] > 0).sum()),
        }
        if "bbox_area" in s:
            summary[tag]["avg_bbox_area"] = float(s["bbox_area"].mean())
    with open(os.path.join(save_dir, "generated_stats.json"), "w") as f:
        json.dump(summary, f, indent=2)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        panels = [("num_nodes", "#nodes"), ("num_edges", "#edges"),
                  ("degrees", "node degree")]
        if "bbox_area" in gen:
            panels += [("bbox_area", "bbox area"), ("bbox_aspect", "bbox aspect")]
        fig, axes = plt.subplots(2, len(panels), figsize=(4 * len(panels), 6),
                                 squeeze=False)
        for col, (key, label) in enumerate(panels):
            for row, (tag, s) in enumerate([("generated", gen), ("ground truth", gt)]):
                ax = axes[row][col]
                ax.hist(s[key], bins=30, color="#4c8cb8")
                ax.set_title(f"{tag}: {label}", fontsize=9)
        fig.tight_layout()
        fig.savefig(os.path.join(save_dir, "generated_stats.png"), dpi=100)
        plt.close(fig)
    except Exception as e:
        logging.warning("stats plotting failed: %s", e)

    logging.info("scene-graph statistics: %s", json.dumps(summary))
    return summary
