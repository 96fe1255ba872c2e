"""Render a quality-run log (train_quality_tpu.py JSON lines) as a markdown
table for BASELINE.md.

Usage: python scripts/quality_report.py <run.log> [--cols distribution|bbox|all]

Each `{"tag": ...}` line becomes a row; columns are grouped so the
distribution metrics and the bbox branch (F1 + BLT IOA, reference surface
sampler_node_adj.py:476-552) can be pasted as separate tables.
"""
import argparse
import json
import sys

GROUPS = {
    "distribution": ["node_degree_mmd_gaussian", "node_type_mmd_gaussian",
                     "edge_type_mmd_gaussian", "triplet_tv_dist_rej_val",
                     "triplet_tv_dist_full_val"],
    "bbox": ["vanilla_f1_avg_max", "area_f1_avg_max", "freq_f1_avg_max",
             "no_node_type_f1_avg_max", "pred_iou_blt", "pred_iou_percp_blt",
             "pred_overlap_blt", "pred_alignment_blt"],
}
GROUPS["all"] = GROUPS["distribution"] + GROUPS["bbox"]

SHORT = {
    "node_degree_mmd_gaussian": "degree MMD",
    "node_type_mmd_gaussian": "node-type MMD",
    "edge_type_mmd_gaussian": "edge-type MMD",
    "triplet_tv_dist_rej_val": "triplet TV (rej, val)",
    "triplet_tv_dist_full_val": "triplet TV (full, val)",
    "vanilla_f1_avg_max": "F1 vanilla",
    "area_f1_avg_max": "F1 area-wt",
    "freq_f1_avg_max": "F1 freq-wt",
    "no_node_type_f1_avg_max": "F1 no-type",
    "pred_iou_blt": "BLT IoU",
    "pred_iou_percp_blt": "BLT percp-IoU",
    "pred_overlap_blt": "BLT overlap",
    "pred_alignment_blt": "BLT align",
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--cols", default="all", choices=sorted(GROUPS))
    args = ap.parse_args(argv)

    rows = []
    for line in open(args.log):
        line = line.strip()
        if not line.startswith('{"tag"'):
            continue
        d = json.loads(line)
        if any(k in d for k in GROUPS["all"]):
            rows.append(d)
    if not rows:
        sys.exit("no metric rows found")

    cols = [c for c in GROUPS[args.cols] if any(c in r for r in rows)]
    print("| Run | " + " | ".join(SHORT[c] for c in cols) + " |")
    print("|---|" + "---|" * len(cols))
    for r in rows:
        cells = [f"{r[c]:.4f}" if c in r else "—" for c in cols]
        print(f"| {r['tag']} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
