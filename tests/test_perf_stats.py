"""Tests for the flops estimator, memory probe, and statistics report."""
import json
import os

import numpy as np

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
    summary = compute_sg_statistics(data, [], {}, str(tmp_path))
    assert os.path.isfile(tmp_path / "generated_stats.json")
    assert os.path.isfile(tmp_path / "generated_stats.png")
    assert summary["gen"]["num_graphs"] == b
    assert 0 < summary["gt"]["avg_nodes"] <= n
