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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "helpers", "dist_child.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_gather_and_barrier():
    port = _free_port()
    procs = []
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("PYTHONPATH", "JAX_PLATFORMS")}
    for pid in range(2):
        env = dict(env_base,
                   DSG_COORDINATOR=f"127.0.0.1:{port}",
                   DSG_NUM_PROCESSES="2",
                   DSG_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, CHILD], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed child timed out")
        outs.append(out)
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
    procs = []
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("PYTHONPATH", "JAX_PLATFORMS")}
    for pid in range(2):
        env = dict(env_base,
                   DSG_COORDINATOR=f"127.0.0.1:{port}",
                   DSG_NUM_PROCESSES="2",
                   DSG_PROCESS_ID=str(pid),
                   DSG_TEST_EXP_DIR=exp_dir,
                   DSG_TEST_SPMD=spmd_mode)
        procs.append(subprocess.Popen(
            [sys.executable, child], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed train child timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"train child {pid} failed:\n{out[-4000:]}"
        assert f"TRAIN_CHILD_OK {pid}" in out, out[-2000:]
    # rank 0 wrote the checkpoint; exactly one run dir (rank-gated writes)
    ckpts = glob.glob(os.path.join(exp_dir, "*", "*", "models_ckpt", "*"))
    assert ckpts, "multi-host training wrote no checkpoint"
