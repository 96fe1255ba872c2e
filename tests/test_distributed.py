"""Two-process jax.distributed smoke test (VERDICT round-1 item 2).

Spawns two real OS processes that rendezvous over local TCP via
maybe_initialize_distributed (the reference's torchrun/NCCL analogue,
dist_training.py:100-126) and exercise gather_to_host / sync_hosts /
is_main_process for real — covering the process_count() > 1 branches that are
dead code in single-process CI.
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # multi-process subprocess e2es (Gloo rendezvous + full CLI training)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "helpers", "dist_child.py")


def _run_children(cmds_envs, tmpdir, timeout):
    """Spawn children with output to FILES (a PIPE would deadlock: one child
    blocked writing >64 KB of XLA warnings into an undrained pipe stalls the
    other child's collectives past the 30 s Gloo rendezvous deadline), wait
    for all, return their outputs."""
    import time as _t

    os.makedirs(tmpdir, exist_ok=True)
    procs, logs = [], []
    for i, (cmd, env) in enumerate(cmds_envs):
        f = open(os.path.join(tmpdir, f"dist_child_{i}.log"), "w+")
        logs.append(f)
        procs.append(subprocess.Popen(cmd, env=env, cwd=REPO,
                                      stdout=f, stderr=subprocess.STDOUT,
                                      text=True))
    deadline = _t.time() + timeout
    for p in procs:
        try:
            p.wait(timeout=max(1, deadline - _t.time()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed child timed out")
    outs = []
    for f in logs:
        f.flush(); f.seek(0)
        outs.append(f.read())
        f.close()
    return procs, outs


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_gather_and_barrier(tmp_path):
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("PYTHONPATH", "JAX_PLATFORMS")}
    cmds = []
    for pid in range(2):
        env = dict(env_base,
                   DSG_COORDINATOR=f"127.0.0.1:{port}",
                   DSG_NUM_PROCESSES="2",
                   DSG_PROCESS_ID=str(pid))
        cmds.append(([sys.executable, CHILD], env))
    procs, outs = _run_children(cmds, str(tmp_path), timeout=300)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out}"
        assert f"CHILD_OK {pid}" in out, out
    assert "main=1" in outs[0] and "main=0" in outs[1]


def test_detect_rendezvous_env_variants(monkeypatch):
    from diffusesg_tpu.parallel.distributed import detect_rendezvous
    for var in ["DSG_COORDINATOR", "MASTER_ADDR", "MASTER_PORT", "RANK",
                "WORLD_SIZE", "OMPI_COMM_WORLD_RANK", "OMPI_COMM_WORLD_SIZE"]:
        monkeypatch.delenv(var, raising=False)
    assert detect_rendezvous() is None
    # torchrun-style env (what the reference reads, dist_training.py:105-109)
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("MASTER_PORT", "29500")
    monkeypatch.setenv("RANK", "3")
    monkeypatch.setenv("WORLD_SIZE", "8")
    rdv = detect_rendezvous()
    assert rdv == {"coordinator_address": "10.0.0.1:29500",
                   "num_processes": 8, "process_id": 3}
    # DSG-native takes precedence
    monkeypatch.setenv("DSG_COORDINATOR", "127.0.0.1:1234")
    monkeypatch.setenv("DSG_NUM_PROCESSES", "2")
    monkeypatch.setenv("DSG_PROCESS_ID", "1")
    rdv = detect_rendezvous()
    assert rdv["coordinator_address"] == "127.0.0.1:1234"
    assert rdv["num_processes"] == 2 and rdv["process_id"] == 1


@pytest.mark.parametrize("spmd_mode", ["gspmd", "shard_map"])
def test_two_process_training_e2e(tmp_path, spmd_mode):
    """Full multi-host training smoke (VERDICT r1 item 2 extended): two real
    processes run the train CLI over a global 4-device mesh — covers the
    replicated-rng contract, the non-addressable per-sample-metric fetch
    (trainer._fetch_metrics), collective checkpointing, and (shard_map
    variant) the explicit per-shard path across REAL processes."""
    import glob

    port = _free_port()
    child = os.path.join(REPO, "tests", "helpers", "dist_train_child.py")
    exp_dir = str(tmp_path / "exp_mh")
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("PYTHONPATH", "JAX_PLATFORMS")}
    cmds = []
    for pid in range(2):
        env = dict(env_base,
                   DSG_COORDINATOR=f"127.0.0.1:{port}",
                   DSG_NUM_PROCESSES="2",
                   DSG_PROCESS_ID=str(pid),
                   DSG_TEST_EXP_DIR=exp_dir,
                   DSG_TEST_SPMD=spmd_mode)
        cmds.append(([sys.executable, child], env))
    procs, outs = _run_children(cmds, exp_dir, timeout=900)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"train child {pid} failed:\n{out[-4000:]}"
        assert f"TRAIN_CHILD_OK {pid}" in out, out[-2000:]
    # rank 0 wrote the checkpoint; exactly one run dir (rank-gated writes)
    ckpts = glob.glob(os.path.join(exp_dir, "*", "*", "models_ckpt", "*"))
    assert ckpts, "multi-host training wrote no checkpoint"
