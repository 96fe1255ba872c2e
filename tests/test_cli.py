"""CLI entry-point smoke tests: the full train main() and eval main() on a
tiny config (the reference's README workflows, end to end)."""
import glob
import os

import numpy as np
import pytest
import yaml


@pytest.fixture()
def tiny_cfg_file(tmp_path):
    with open("configs/vg_small_test.yaml") as f:
        raw = yaml.safe_load(f)
    raw["exp_dir"] = str(tmp_path / "exp")
    raw["dataset"]["max_node_num"] = 8
    raw["dataset"]["subset"] = 8
    raw["train"]["batch_size"] = 8
    raw["train"]["max_epoch"] = 2
    raw["train"]["save_interval"] = 2
    raw["train"]["sample_interval"] = 1000
    raw["train"]["ema_coef"] = [0.9]
    raw["test"]["batch_size"] = 8
    raw["test"]["eval_size"] = 8
    raw["mcmc"]["num_steps"] = 6
    path = tmp_path / "tiny.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(raw, f)
    return str(path)


def test_train_then_eval_cli(tiny_cfg_file, tmp_path):
    from diffusesg_tpu.cli import train as train_cli
    from diffusesg_tpu.cli import eval as eval_cli

    train_cli.main(["-c", tiny_cfg_file, "--data_root", "/nonexistent"])
    runs = glob.glob(os.path.join(os.path.dirname(tiny_cfg_file), "exp", "*", "*"))
    assert runs, "train CLI produced no run dir"
    run_dir = runs[0]
    assert os.path.isfile(os.path.join(run_dir, "config.yaml"))
    ckpts = glob.glob(os.path.join(run_dir, "models_ckpt", "*"))
    assert ckpts, "no checkpoints written"

    eval_cli.main(["-p", run_dir, "--eval_size", "8", "--num_steps", "4",
                   "--data_root", "/nonexistent", "--use_ema", "all"])
    csvs = glob.glob(os.path.join(os.path.dirname(tiny_cfg_file), "exp",
                                  "*", "*", "eval_results.csv"))
    assert csvs, "eval CLI wrote no results csv"
    import pandas as pd
    df = pd.read_csv(csvs[0])
    assert "node_type_mmd_gaussian" in df.columns
    assert len(df) >= 1
    assert np.isfinite(df["node_type_mmd_gaussian"].iloc[0])
