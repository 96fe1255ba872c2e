"""Offline evaluation of saved samples: recompute all metrics from a
final_samples_array*.npz.

Counterpart of the reference offline helper
(reference: DiffuseSG/helper/eval_sg_samples.py:230-394): loads the npz dump
written by sg_go_sampling and re-runs the metric suite against the dataset
statistics, without touching the model.
"""
from __future__ import annotations

import argparse
import json
import logging

import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from ..config import load_config
    from ..data import load_data
    from ..eval import SceneGraphEvaluator
    from ..models.channels import dataset_constants
    from ..ops.box_ops import box_cxcywh_to_xyxy

    p = argparse.ArgumentParser(description="offline sample evaluation")
    p.add_argument("--npz", required=True)
    p.add_argument("-c", "--config_file", required=True)
    p.add_argument("--data_root", default=".")
    p.add_argument("--out", default=None, help="optional JSON output path")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    config = load_config(args.config_file)
    bundle = load_data(config, eval_mode=True, data_root=args.data_root)
    data = np.load(args.npz, allow_pickle=True)
    num_node_type, num_edge_type, _ = dataset_constants(config.dataset.name)

    ev = SceneGraphEvaluator()
    kernels = ["gaussian"]
    flags = data["samples_node_flags"]
    flags_gt = data["gt_node_flags"]
    metrics = {"gen_data_size": int(len(data["samples_a"]))}

    deg = ev.compute_node_degree_mmd(data["samples_a"], data["gt_a"], kernels)
    for kname, sub in deg.items():
        for key, val in sub.items():
            metrics[f"node_{key}_mmd_{kname}"] = val
    metrics.update({f"node_type_mmd_{k}": v for k, v in ev.compute_node_type_mmd(
        data["samples_x"], data["gt_x"], flags, flags_gt, num_node_type, kernels).items()})
    metrics.update({f"edge_type_mmd_{k}": v for k, v in ev.compute_edge_type_mmd(
        data["samples_a"], data["gt_a"], flags, flags_gt, num_edge_type, kernels).items()})

    for tag, tdict in [("val", bundle.test_triplet_dict),
                       ("train", bundle.train_triplet_dict)]:
        rej, all_, full, novelty = ev.compute_triplet_tv_dist(
            data["samples_a"], data["samples_x"], flags, tdict,
            bundle.test_triplet_dict)
        metrics.update({f"triplet_tv_dist_rej_{tag}": rej,
                        f"triplet_tv_dist_all_{tag}": all_,
                        f"triplet_tv_dist_full_{tag}": full,
                        f"triplet_novelty_{tag}": novelty})

    if "samples_x_bbox" in data and data["samples_x_bbox"].ndim == 3:
        pred_bbox = np.clip(np.asarray(
            box_cxcywh_to_xyxy(jnp.asarray(data["samples_x_bbox"]))), 0, 1)
        gt_bbox = np.clip(np.asarray(
            box_cxcywh_to_xyxy(jnp.asarray(data["gt_x_bbox"]))), 0, 1)
        for prefix, bbox, fl in [("pred", pred_bbox, flags), ("gt", gt_bbox, flags_gt)]:
            metrics[f"{prefix}_iou_blt"] = ev.compute_bbox_ioa(
                bbox, fl, flag_vanilla_iou=True, return_mean=True)
            metrics[f"{prefix}_iou_percp_blt"] = ev.compute_bbox_ioa(
                bbox, fl, canvas_size=32, flag_perceptual_iou=True, return_mean=True)
            metrics[f"{prefix}_overlap_blt"] = ev.compute_bbox_ioa(
                bbox, fl, flag_overlap=True, return_mean=True)
            metrics[f"{prefix}_alignment_blt"] = ev.compute_bbox_ioa(
                bbox, fl, flag_alignment=True, return_mean=True)
        w_area = np.asarray([bundle.bbox_area_stat[k]
                             for k in sorted(bundle.bbox_area_stat)], np.float64)
        w_freq = np.asarray([bundle.bbox_freq_stat[k]
                             for k in sorted(bundle.bbox_freq_stat)], np.float64)
        weights = [np.ones_like(w_area), w_area / w_area.sum(), w_freq / w_freq.sum()]
        mat_f1 = ev.compute_bbox_f1(pred_bbox, data["samples_x"], flags,
                                    gt_bbox, data["gt_x"], flags_gt, weights)
        for i, name in enumerate(["vanilla", "area", "freq"]):
            m = mat_f1[..., i]
            metrics[f"{name}_f1_avg_max"] = float(m.max(-1).mean())
            metrics[f"{name}_f1_avg_mean"] = float(m.mean(-1).mean())
            metrics[f"{name}_f1_avg_median"] = float(np.median(m, -1).mean())

    for k, v in metrics.items():
        logging.info("%s = %s", k, v)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2, default=float)
    return metrics


if __name__ == "__main__":
    main()
