"""CLI entry-point smoke tests: the full train main() and eval main() on a
tiny config (the reference's README workflows, end to end)."""
import glob
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess CLI e2es (train/eval/resume/preemption)
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

    # eval-side EMA-weight selection (reference: eval.py:15-40): asking for a
    # specific beta appends exactly one row per checkpoint
    rows_before = sum(len(pd.read_csv(p)) for p in csvs)
    eval_cli.main(["-p", run_dir, "--eval_size", "8", "--num_steps", "4",
                   "--data_root", "/nonexistent", "--ema_weights", "0.9"])
    csvs2 = glob.glob(os.path.join(os.path.dirname(tiny_cfg_file), "exp",
                                   "*", "*", "eval_results.csv"))
    rows_after = sum(len(pd.read_csv(p)) for p in csvs2)
    assert rows_after == rows_before + len(ckpts)
    newest = max(csvs2, key=os.path.getmtime)
    df2 = pd.read_csv(newest)
    assert str(df2["weight_kw"].iloc[-1]).startswith("0.9")

    # conditional completion through the product CLI (--inpaint_frac):
    # carried halves must survive the reverse diffusion bit-exactly
    eval_cli.main(["-p", run_dir, "--eval_size", "8", "--num_steps", "4",
                   "--data_root", "/nonexistent", "--ema_weights", "0.9",
                   "--inpaint_frac", "0.5"])
    npzs = glob.glob(os.path.join(os.path.dirname(tiny_cfg_file), "exp",
                                  "*", "*", "sampling_during_evaluation", "*",
                                  "final_samples_array_before_eval.npz"))
    assert npzs, "inpaint eval CLI wrote no npz"
    data = np.load(max(npzs, key=os.path.getmtime), allow_pickle=True)
    flags = data["gt_node_flags"].astype(bool)
    known = (np.arange(flags.shape[1])[None, :]
             < np.ceil(flags.sum(1) * 0.5)[:, None]) & flags
    np.testing.assert_array_equal(data["samples_x"][known], data["gt_x"][known])
    pair = known[:, :, None] & known[:, None, :]
    np.testing.assert_array_equal(data["samples_a"][pair], data["gt_a"][pair])


def test_train_resume_cli(tiny_cfg_file, tmp_path):
    """--resume restores the FULL state (params + optimizer + EMAs + step)
    and training continues from it (reference: weights-only resume at
    learning_utils.py:95-98; this framework also resumes opt_state/step so
    the LR schedule and Adam moments continue)."""
    import jax.numpy as jnp
    from diffusesg_tpu.cli import train as train_cli
    from diffusesg_tpu.utils.checkpoint import restore_checkpoint

    train_cli.main(["-c", tiny_cfg_file, "--data_root", "/nonexistent"])
    exp_root = os.path.join(os.path.dirname(tiny_cfg_file), "exp")
    first_run = max(glob.glob(os.path.join(exp_root, "*", "*")),
                    key=os.path.getmtime)
    ckpts = sorted(glob.glob(os.path.join(first_run, "models_ckpt", "*")))
    assert ckpts
    base = restore_checkpoint(ckpts[-1])
    base_step = int(base["step"])
    assert base_step > 0

    train_cli.main(["-c", tiny_cfg_file, "--data_root", "/nonexistent",
                    "--resume", ckpts[-1]])
    second_run = max(glob.glob(os.path.join(exp_root, "*", "*")),
                     key=os.path.getmtime)
    assert second_run != first_run
    new_ckpts = sorted(glob.glob(os.path.join(second_run, "models_ckpt", "*")))
    assert new_ckpts
    resumed = restore_checkpoint(new_ckpts[-1])
    # step counter continued past the restore point -> opt state was restored
    assert int(resumed["step"]) > base_step
    # and training actually moved the weights from the restore point
    import jax

    def leaf0(p):
        return np.asarray(jnp.ravel(next(iter(jax.tree_util.tree_leaves(p["params"])))))

    assert not np.allclose(leaf0(resumed), leaf0(base))


def test_checkpoint_discovery_multi_ckpt_dir(tmp_path):
    """Eval-side ckpt search/epoch filtering against a real multi-checkpoint
    run directory (reference: arg_parser.py:144-184)."""
    import jax
    import jax.numpy as jnp
    from diffusesg_tpu.train import create_train_state, make_optimizer
    from diffusesg_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint, select_checkpoints,
    )

    opt = make_optimizer(1e-3, 1.0, 1)
    ckpt_dir = tmp_path / "models_ckpt"
    for epoch in [0, 2, 4, 6, 8]:
        params = {"w": jnp.full((4,), float(epoch))}
        state = create_train_state(params, [0.9, 0.999], opt)
        save_checkpoint(str(ckpt_dir / f"{epoch:05d}"), state,
                        extra={"epoch": epoch})

    all_ckpts = select_checkpoints(str(ckpt_dir))
    assert [os.path.basename(p) for p in all_ckpts] == \
        ["00000", "00002", "00004", "00006", "00008"]
    # range filter
    sel = select_checkpoints(str(ckpt_dir), min_epoch=2, max_epoch=6)
    assert [int(os.path.basename(p)) for p in sel] == [2, 4, 6]
    # explicit epoch
    sel = select_checkpoints(str(ckpt_dir), specify_epoch=4)
    assert [int(os.path.basename(p)) for p in sel] == [4]
    # count limit picks evenly spaced endpoints-inclusive
    sel = select_checkpoints(str(ckpt_dir), num_ckpts=3)
    assert [int(os.path.basename(p)) for p in sel] == [0, 4, 8]
    # payload round-trips with epoch metadata + both EMA copies
    payload = restore_checkpoint(all_ckpts[2])
    assert payload["extra"]["epoch"] == 4
    np.testing.assert_allclose(payload["params"]["w"], 4.0)
    assert np.asarray(payload["ema_params"]["w"]).shape == (2, 4)

    # restoring WITH a template must preserve the optax pytree structure of
    # opt_state even though the ckpt carries an 'extra' dict the template
    # lacks (a schema-free fallback would return raw nested dicts, breaking
    # optimizer.update on resume)
    template = create_train_state({"w": jnp.zeros((4,))}, [0.9, 0.999], opt)
    payload_t = restore_checkpoint(all_ckpts[2], template)
    assert payload_t["extra"]["epoch"] == 4
    ref_treedef = jax.tree_util.tree_structure(template.opt_state)
    assert jax.tree_util.tree_structure(payload_t["opt_state"]) == ref_treedef
    np.testing.assert_allclose(payload_t["params"]["w"], 4.0)


def test_train_cli_shard_map_mode(tiny_cfg_file, tmp_path):
    """tpu.spmd_mode=shard_map drives the explicit per-shard path end to
    end (train loop + in-training sampling) on the 8-device CPU mesh."""
    import yaml as _yaml
    from diffusesg_tpu.cli import train as train_cli

    with open(tiny_cfg_file) as f:
        raw = _yaml.safe_load(f)
    raw["exp_dir"] = str(tmp_path / "exp_sm")
    # 2 epochs: epoch 0 samples with sanity_check=True (GSPMD fallback),
    # epoch 1 hits the real make_shardmap_sample_fn branch
    raw["train"]["max_epoch"] = 2
    raw["train"]["save_interval"] = 1
    raw["train"]["sample_interval"] = 1  # force the sampling path too
    raw["tpu"]["spmd_mode"] = "shard_map"
    cfg_sm = tmp_path / "tiny_sm.yaml"
    with open(cfg_sm, "w") as f:
        _yaml.safe_dump(raw, f)

    train_cli.main(["-c", str(cfg_sm), "--data_root", "/nonexistent"])
    runs = glob.glob(str(tmp_path / "exp_sm" / "*" / "*"))
    assert runs, "shard_map train CLI produced no run dir"
    run_dir = runs[0]
    assert glob.glob(os.path.join(run_dir, "models_ckpt", "*"))
    import pandas as pd
    csv = os.path.join(run_dir, "eval_results.csv")
    assert os.path.isfile(csv), "in-training sampling wrote no eval csv"
    df = pd.read_csv(csv)
    # epoch-0 sanity row + epoch-1 real (shard_map-sampled) inference row
    assert len(df) >= 2 and np.isfinite(df["node_type_mmd_gaussian"].iloc[-1])


def test_preemption_checkpoint_and_run_dir_resume(tiny_cfg_file, tmp_path):
    """SIGTERM mid-training writes models_ckpt/preempt and exits cleanly;
    `--resume <run_dir>` picks it up and continues to completion at the
    right epoch (no reference counterpart — preemptible-TPU safety)."""
    import signal
    import subprocess
    import sys
    import time as _time

    import yaml as _yaml
    from diffusesg_tpu.utils.checkpoint import restore_checkpoint

    with open(tiny_cfg_file) as f:
        raw = _yaml.safe_load(f)
    raw["exp_dir"] = str(tmp_path / "exp_pre")
    # long enough that the run CANNOT finish before the poll below sees it
    # and SIGTERMs it — with a warm persistent XLA cache epochs take ~50 ms,
    # so 60 epochs would complete inside one poll interval (a race this test
    # lost twice before the bump)
    raw["train"]["max_epoch"] = 5000
    raw["train"]["save_interval"] = 1000  # no periodic ckpts: preempt only
    raw["train"]["sample_interval"] = 1000
    cfg = tmp_path / "pre.yaml"
    with open(cfg, "w") as f:
        _yaml.safe_dump(raw, f)

    driver = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 2)\n"
        f"jax.config.update('jax_compilation_cache_dir', "
        f"{repr(os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '.jax_cache')))})\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)\n"
        f"import sys; sys.path.insert(0, {repr(os.getcwd())})\n"
        "from diffusesg_tpu.cli import train as t\n"
        f"t.main(['-c', {repr(str(cfg))}, '--data_root', '/nonexistent'])\n"
        "print('TRAIN_EXITED_CLEANLY')\n")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS")}
    # child output goes to a FILE, not a PIPE: XLA can emit >64 KB of
    # warnings (e.g. persistent-cache AOT feature-mismatch notes) before
    # training starts, and an undrained pipe would deadlock the child in
    # write() while this test polls for progress that never comes
    child_log = open(tmp_path / "pre_child.log", "w+")
    proc = subprocess.Popen([sys.executable, "-c", driver], env=env,
                            cwd=os.getcwd(), stdout=child_log,
                            stderr=subprocess.STDOUT, text=True)

    def _child_out():
        child_log.flush()
        child_log.seek(0)
        return child_log.read()
    # wait until some training happened (first scalars written), then TERM.
    # Generous deadline: on a loaded 1-core host the child's first compile
    # alone can take many minutes (measured 44 s in isolation, >15 min with
    # concurrent suites on this box); the loop exits as soon as the first
    # epoch lands, so the deadline only bounds the pathological case
    deadline = _time.time() + 1800
    run_dir = None
    while _time.time() < deadline:
        runs = glob.glob(str(tmp_path / "exp_pre" / "*" / "*" / "scalars.jsonl"))
        if runs and os.path.getsize(runs[0]) > 0:
            run_dir = os.path.dirname(runs[0])
            break
        if proc.poll() is not None:
            break
        _time.sleep(0.25)
    if not run_dir:
        proc.kill()  # don't leak a 5000-epoch child
        assert False, f"training never started:\n{_child_out()[-3000:]}"
    proc.send_signal(signal.SIGTERM)
    proc.wait(timeout=300)
    out = _child_out()
    assert proc.returncode == 0, f"not a clean exit:\n{out[-3000:]}"
    assert "TRAIN_EXITED_CLEANLY" in out
    pre = os.path.join(run_dir, "models_ckpt", "preempt")
    assert os.path.isdir(pre), f"no preempt checkpoint:\n{out[-3000:]}"
    payload = restore_checkpoint(pre)
    assert payload["extra"]["preempted"] and int(payload["step"]) > 0

    # run-dir resume continues the interrupted run to completion
    from diffusesg_tpu.cli import train as train_cli
    with open(cfg) as f:
        raw2 = _yaml.safe_load(f)
    raw2["train"]["max_epoch"] = int(payload["extra"]["epoch"]) + 3
    raw2["train"]["save_interval"] = 1  # so the short resumed run checkpoints
    cfg2 = tmp_path / "pre2.yaml"
    with open(cfg2, "w") as f:
        _yaml.safe_dump(raw2, f)
    train_cli.main(["-c", str(cfg2), "--data_root", "/nonexistent",
                    "--resume", run_dir])
    runs2 = sorted(glob.glob(str(tmp_path / "exp_pre" / "*" / "*")),
                   key=os.path.getmtime)
    resumed_dir = runs2[-1]
    assert resumed_dir != run_dir
    final = sorted(glob.glob(os.path.join(resumed_dir, "models_ckpt", "*")))
    assert final, "resumed run saved no checkpoint"
    res = restore_checkpoint(final[-1])
    assert int(res["step"]) > int(payload["step"])
