"""Child process for the two-process multi-host TRAINING smoke test.

Runs the real CLI train main() — rendezvous, per-host data shard, GSPMD
train step over a global 4-device mesh (2 processes x 2 local CPU
devices), epoch metric fetch across non-addressable shards
(trainer._fetch_metrics), rank-0-gated checkpointing — end to end on a
tiny synthetic config.  Launched by tests/test_distributed.py.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import yaml  # noqa: E402


def main():
    exp_dir = os.environ["DSG_TEST_EXP_DIR"]
    with open(os.path.join(os.path.dirname(__file__), "..", "..",
                           "configs", "vg_small_test.yaml")) as f:
        raw = yaml.safe_load(f)
    raw["exp_dir"] = exp_dir
    raw["dataset"]["max_node_num"] = 8
    raw["dataset"]["subset"] = 8
    raw["train"]["batch_size"] = 8
    # 2 epochs: epoch 0 samples with sanity_check (GT-denoiser fixture),
    # epoch 1 exercises the REAL multi-host sampling path (per-process
    # strided eval shard on a local mesh + allgather)
    raw["train"]["max_epoch"] = 2
    raw["train"]["save_interval"] = 1
    raw["train"]["sample_interval"] = 1
    raw["test"]["num_interim"] = 0
    raw["train"]["ema_coef"] = [0.9]
    raw["test"]["batch_size"] = 8
    # NOT divisible by 2 processes: exercises shard_for_process wrap-padding
    # + the orchestrator's post-gather trim
    raw["test"]["eval_size"] = 7
    raw["mcmc"]["num_steps"] = 4
    # DSG_TEST_SPMD=shard_map covers the explicit per-shard path across
    # REAL processes (the Pallas multi-chip mode, parallel/shardmap_dp.py)
    raw["tpu"]["spmd_mode"] = os.environ.get("DSG_TEST_SPMD", "gspmd")
    cfg_path = os.path.join(exp_dir, f"cfg_{os.environ['DSG_PROCESS_ID']}.yaml")
    os.makedirs(exp_dir, exist_ok=True)
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)

    from diffusesg_tpu.cli import train as train_cli
    train_cli.main(["-c", cfg_path, "--data_root", "/nonexistent"])

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    print(f"TRAIN_CHILD_OK {jax.process_index()}", flush=True)


if __name__ == "__main__":
    main()
