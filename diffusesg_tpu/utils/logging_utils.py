"""Run-directory setup, seeding, per-process logging, metric writers.

Counterpart of the reference logging layer
(reference: DiffuseSG/utils/arg_parser.py:288-436): timestamped logdir,
per-process log files, resolved-config dump, code backup, txt loss logs, and
a lightweight scalar writer (CSV/JSONL; TensorBoard is attached when
available, mirroring the rank-0 SummaryWriter).
"""
from __future__ import annotations

import json
import logging
import os
import random
import shutil
import sys
import time

import numpy as np


def set_seed_and_logger(config, mode: str = "train", comment: str = "",
                        log_level: str = "INFO") -> str:
    """Seed host RNGs per process, create the logdir, attach log handlers.

    Per-process seed offset mirrors the reference's per-rank offset
    (arg_parser.py:293-294).  Returns the logdir.
    """
    import jax
    seed = int(config.seed) + jax.process_index()
    random.seed(seed)
    np.random.seed(seed)

    stamp = time.strftime("%b-%d-%H-%M-%S")
    run_name = f"{config.dataset.name}_{mode}_{stamp}" + (f"_{comment}" if comment else "")
    logdir = os.path.join(config.exp_dir, config.exp_name, run_name)
    os.makedirs(logdir, exist_ok=True)
    with config.unlocked():
        config.logdir = logdir
        config.model_ckpt_dir = os.path.join(logdir, "models_ckpt")
        config.model_save_dir = os.path.join(logdir, "models")
    os.makedirs(config.model_ckpt_dir, exist_ok=True)
    os.makedirs(config.model_save_dir, exist_ok=True)

    log_file = os.path.join(logdir, f"process_{jax.process_index()}.log")
    handlers = [logging.FileHandler(log_file)]
    if jax.process_index() == 0:
        handlers.append(logging.StreamHandler(sys.stdout))
    level = getattr(logging, str(log_level).upper(), logging.INFO)
    logging.basicConfig(level=level, handlers=handlers, force=True,
                        format="%(asctime)s %(levelname)s %(message)s")

    from ..config import save_config
    if jax.process_index() == 0:
        save_config(config, os.path.join(logdir, "config.yaml"))
    return logdir


def backup_code(logdir: str, src_root: str | None = None) -> None:
    """Snapshot the framework source into <logdir>/code
    (reference: arg_parser.py:398-408)."""
    import jax
    if jax.process_index() != 0:
        return
    src_root = src_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(logdir, "code", os.path.basename(src_root))
    shutil.copytree(src_root, dst,
                    ignore=shutil.ignore_patterns("__pycache__", "*.pyc"),
                    dirs_exist_ok=True)


class ScalarWriter:
    """Epoch/step scalar sink: JSONL always; TensorBoard when importable
    (reference rank-0 SummaryWriter, arg_parser.py:390-394)."""

    def __init__(self, logdir: str, enabled: bool = True):
        self.enabled = enabled
        self.jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a") if enabled else None
        self.tb = None
        if enabled:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(log_dir=os.path.join(logdir, "tensorboard"))
            except Exception:
                self.tb = None

    def add_scalar(self, tag: str, value: float, step: int):
        if not self.enabled:
            return
        self.jsonl.write(json.dumps({"tag": tag, "value": float(value),
                                     "step": int(step)}) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            self.tb.add_scalar(tag, float(value), int(step))

    def close(self):
        if self.jsonl:
            self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


class LossTxtLogger:
    """Raw per-sample loss text files train_loss.log / test_loss.log
    (reference: arg_parser.py:411-421, trainer_utils.py:127-129)."""

    def __init__(self, logdir: str, enabled: bool = True):
        self.enabled = enabled
        if enabled:
            self.f_train = open(os.path.join(logdir, "train_loss.log"), "a")
            self.f_test = open(os.path.join(logdir, "test_loss.log"), "a")

    def write(self, mode: str, epoch: int, sigmas, loss_adj, loss_node):
        if not self.enabled:
            return
        f = self.f_train if mode == "train" else self.f_test
        for s, la, ln in zip(np.asarray(sigmas).ravel(),
                             np.asarray(loss_adj).ravel(),
                             np.asarray(loss_node).ravel()):
            f.write(f"{epoch:05d}\t{s:.6f}\t{la:.6f}\t{ln:.6f}\n")
        f.flush()

    def close(self):
        if self.enabled:
            self.f_train.close()
            self.f_test.close()
