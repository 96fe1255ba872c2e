"""Tests for the flops estimator, memory probe, and statistics report."""
import json
import os

import numpy as np
import pytest

from diffusesg_tpu.config import load_config
from diffusesg_tpu.eval.sg_statistics import compute_sg_statistics
from diffusesg_tpu.utils.perf import estimate_model_flops, device_memory_stats


def test_flops_estimate_magnitude():
    cfg = load_config("configs/edm_diffuse_sg_regular_visual_genome.yaml")
    est = estimate_model_flops(cfg)
    # ~36M params on a 64x64 grid: forward must be in the GFLOP range
    assert 1e9 < est["total"] < 1e12
    assert len(est["per_stage"]) == len(cfg.model.depths)


def test_device_memory_stats_runs():
    stats = device_memory_stats()
    assert len(stats) >= 1


def test_compute_sg_statistics(tmp_path):
    rs = np.random.RandomState(0)
    b, n = 6, 8
    flags = np.ones((b, n), dtype=bool)
    flags[:, 6:] = False
    data = {
        "samples_a": rs.randint(0, 4, (b, n, n)) * np.outer(flags[0], flags[0]),
        "samples_x": rs.randint(0, 10, (b, n)),
        "samples_node_flags": flags,
        "samples_x_bbox": rs.rand(b, n, 4),
        "gt_a": rs.randint(0, 4, (b, n, n)) * np.outer(flags[0], flags[0]),
        "gt_x": rs.randint(0, 10, (b, n)),
        "gt_node_flags": flags,
        "gt_x_bbox": rs.rand(b, n, 4),
    }
    idx_to_word = {"ind_to_classes": [f"cls{i}" for i in range(10)],
                   "ind_to_predicates": [f"rel{i}" for i in range(4)]}
    summary = compute_sg_statistics(data, [], idx_to_word, str(tmp_path))
    assert os.path.isfile(tmp_path / "generated_stats.json")
    assert os.path.isfile(tmp_path / "generated_stats.png")
    assert os.path.isfile(tmp_path / "sg_statistics.txt")
    assert summary["gen"]["num_graphs"] == b
    assert 0 < summary["gt"]["avg_nodes"] <= n
    # full report fields (reference sg_utils.py:9-345 sections)
    assert summary["gen"]["distinct_triplets"] > 0
    assert len(summary["edge_freq"]) > 0
    assert abs(sum(r["gen"] for r in summary["edge_freq"]) - 1.0) < 1e-6
    assert len(summary["edge_occupancy_bins"]) == 10
    assert abs(sum(summary["edge_occupancy_bins"]) - 100.0) < 1e-6
    assert "bbox_by_class" in summary["gen"]
    # every reference dashboard panel exists
    for png in ["node_freq.png", "node_freq_diff.png", "edge_freq.png",
                "edge_freq_diff.png", "node_num_vs_edge_num_line.png",
                "node_num_vs_edge_num_scatter.png", "edge_sparsity.png"]:
        assert os.path.isfile(tmp_path / png), png


def test_sg_statistics_vs_reference_counts(tmp_path):
    """Counting semantics parity: our vectorized uniques/frequency tables
    match the reference's per-entry dict loops (sg_utils.py:24-50) run
    directly on the same arrays."""
    rs = np.random.RandomState(1)
    b, n = 5, 7
    flags = np.zeros((b, n), bool)
    for i in range(b):
        flags[i, :rs.randint(2, n + 1)] = True
    adjs = rs.randint(0, 4, (b, n, n)) * (flags[:, :, None] & flags[:, None, :])
    nodes = rs.randint(0, 6, (b, n))
    classes = [f"c{i}" for i in range(6)]
    preds = [f"p{i}" for i in range(4)]

    # reference-style loop (transcribed from sg_utils.py:24-50)
    node_d, edge_d, trip_d = {}, {}, {}
    for g in range(b):
        node_num = int(flags[g].sum())
        for i in range(node_num):
            nk = classes[int(nodes[g][i])]
            node_d[nk] = node_d.get(nk, 0) + 1
            for j in range(node_num):
                e = int(adjs[g][i][j])
                if e > 0:
                    ek = preds[e]
                    edge_d[ek] = edge_d.get(ek, 0) + 1
                    tk = nk + "_" + ek + "_" + classes[int(nodes[g][j])]
                    trip_d[tk] = trip_d.get(tk, 0) + 1

    from diffusesg_tpu.eval.sg_statistics import _type_and_triplet_counts
    got_n, got_e, got_t = _type_and_triplet_counts(
        adjs, nodes, flags, classes, preds)
    assert dict(got_n) == node_d
    assert dict(got_e) == edge_d
    assert dict(got_t) == trip_d


def test_sg_statistics_vs_reference_function(tmp_path, caplog):
    """Run the ACTUAL reference compute_sg_statistics (sg_utils.py:9-345,
    imported from /root/reference) on identical inputs and compare its
    logged summary numbers against our report's summary dict."""
    import logging
    import re
    import sys

    REF = "/root/reference/DiffuseSG"
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    import matplotlib
    matplotlib.use("Agg")

    rs = np.random.RandomState(7)
    b, n = 8, 9
    flags = np.zeros((b, n), bool)
    for i in range(b):
        flags[i, :rs.randint(2, n + 1)] = True
    adjs = rs.randint(0, 5, (b, n, n)) * (flags[:, :, None] & flags[:, None, :])
    for g in range(b):
        np.fill_diagonal(adjs[g], 0)
    nodes = rs.randint(0, 150, (b, n)) * flags
    idx_to_word = {"ind_to_classes": [f"c{i}" for i in range(150)],
                   "ind_to_predicates": [f"p{i}" for i in range(51)]}
    pkl_data = []
    for g in range(b):
        k = int(flags[g].sum())
        pkl_data.append({"node_labels": nodes[g, :k].astype(np.int64),
                         "edge_map": adjs[g, :k, :k].astype(np.int64)})

    (tmp_path / "ref").mkdir()  # the reference assumes the dir exists
    sys.path.insert(0, REF)
    try:
        from utils.sg_utils import compute_sg_statistics as ref_stats
        with caplog.at_level(logging.INFO):
            ref_stats({"samples_x": nodes, "samples_a": adjs,
                       "samples_node_flags": flags},
                      pkl_data, idx_to_word, str(tmp_path / "ref"))
    finally:
        sys.path.remove(REF)

    logged = {}
    for rec in caplog.records:
        m = re.match(r"(.+?)\s+- Generated: ([-\d.]+) \t GT: ([-\d.]+)",
                     rec.getMessage())
        if m:
            logged[m.group(1).strip()] = (float(m.group(2)), float(m.group(3)))

    from diffusesg_tpu.eval.sg_statistics import compute_sg_statistics
    summary = compute_sg_statistics(
        {"samples_x": nodes, "samples_a": adjs, "samples_node_flags": flags,
         "gt_x": nodes, "gt_a": adjs, "gt_node_flags": flags},
        pkl_data, idx_to_word, str(tmp_path / "ours"))

    gen = summary["gen"]
    assert logged["Node Number Mean"][0] == pytest.approx(gen["avg_nodes"], abs=5.1e-3)
    assert logged["Node Number Std."][0] == pytest.approx(gen["std_nodes"], abs=5.1e-3)
    assert logged["Edge Number Mean"][0] == pytest.approx(gen["avg_edges"], abs=5.1e-3)
    assert logged["Edge Number Std."][0] == pytest.approx(gen["std_edges"], abs=5.1e-3)
    assert logged["#Unique Nodes"][0] == gen["distinct_node_types"]
    assert logged["#Unique Edges"][0] == gen["distinct_edge_types"]
    assert logged["#Unique Triplet"][0] == gen["distinct_triplets"]
    # GT side vs the pickle records
    gt = summary["gt"]
    assert logged["Node Number Mean"][1] == pytest.approx(gt["avg_nodes"], abs=5.1e-3)
    assert logged["#Unique Triplet"][1] == gt["distinct_triplets"]


def test_device_peak_tflops_table():
    from diffusesg_tpu.utils.perf import device_peak_tflops
    assert device_peak_tflops("TPU v5 lite") == 197.0
    assert device_peak_tflops("TPU v5p") == 459.0
    assert device_peak_tflops("TPU v4") == 275.0
    assert device_peak_tflops("TPU v5 lite", dtype="float32") is None
    assert device_peak_tflops("cpu") is None
