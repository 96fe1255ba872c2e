"""Shared CLI argument parsing.

Counterpart of the reference arg parser (reference:
DiffuseSG/utils/arg_parser.py:21-184): same flag names so reference run
scripts translate directly; YAML + keyword-wise overrides; eval-side
checkpoint discovery.
"""
from __future__ import annotations

import argparse
import os

from ..config import ConfigDict, load_config


def build_train_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="diffusesg_tpu training")
    p.add_argument("-c", "--config_file", required=True)
    p.add_argument("-m", "--comment", default="")
    p.add_argument("-l", "--log_level", default="INFO",
                   help="root logging level (reference: arg_parser.py:22)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--dataset_name", default=None)
    p.add_argument("--max_node_num", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--eval_size", type=int, default=None)
    p.add_argument("--lr_init", type=float, default=None)
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--sample_interval", type=int, default=None)
    p.add_argument("--save_interval", type=int, default=None)
    p.add_argument("--subset", type=int, default=None)
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--node_encoding", default=None)
    p.add_argument("--edge_encoding", default=None)
    p.add_argument("--node_only", action="store_true")
    p.add_argument("--binary_edge", action="store_true")
    p.add_argument("--self_cond", default=None)
    p.add_argument("--iou_loss_type", default=None)
    p.add_argument("--iou_loss_weight", type=float, default=None)
    p.add_argument("--resume", default=None)
    # backbone overrides (reference: arg_parser.py:233-246; a scalar replaces
    # an int key or a single-element list key)
    p.add_argument("--feature_dims", type=int, default=None)
    p.add_argument("--window_size", type=int, default=None)
    p.add_argument("--patch_size", type=int, default=None)
    # accepted for reference-script compatibility; parallelism is automatic
    # SPMD over jax.devices() here, so these are no-ops (reference flags:
    # arg_parser.py:31-41)
    p.add_argument("--dp", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--ddp", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--ddp_gpu_ids", nargs="+", default=None,
                   help=argparse.SUPPRESS)
    p.add_argument("--ddp_init_method", default=None, help=argparse.SUPPRESS)
    p.add_argument("--data_root", default=".")
    p.add_argument("-o", "--override", action="append", default=[],
                   metavar="KEY=VALUE", help="arbitrary config override")
    return p


def build_eval_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="diffusesg_tpu evaluation")
    p.add_argument("-p", "--model_path", required=True,
                   help="checkpoint directory or run dir containing models_ckpt/")
    p.add_argument("-c", "--config_file", default=None,
                   help="defaults to config.yaml next to the checkpoints")
    p.add_argument("-m", "--comment", default="",
                   help="run-dir name suffix (reference: arg_parser.py:23)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--eval_size", type=int, default=None)
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("-l", "--log_level", default="INFO",
                   help="root logging level (reference: arg_parser.py:22)")
    p.add_argument("--min_epoch", type=int, default=None)
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--specify_epoch", type=int, nargs="+", default=None,
                   help="evaluate exactly these epochs "
                        "(reference: arg_parser.py:158-165)")
    p.add_argument("--num_ckpts", type=int, default=None)
    p.add_argument("--search_weights", action="store_true",
                   help="accepted for reference-script compatibility; "
                        "directory checkpoint discovery is automatic here")
    p.add_argument("--ema_weights", nargs="*", default=None,
                   help="EMA beta values to evaluate (default: all)")
    p.add_argument("--use_ema", nargs="*", default="all",
                   help="'all', 'none', or beta values; 1.0 means the raw "
                        "online weights (reference: eval.py:15-40)")
    p.add_argument("--sanity_check", action="store_true")
    p.add_argument("--random_node_num", action="store_true")
    p.add_argument("--inpaint_frac", type=float, default=None,
                   help="conditional completion: pin the first "
                        "ceil(n_valid * FRAC) nodes of every test graph "
                        "(labels + boxes + edges among them) to ground truth "
                        "and sample only the remainder (RePaint-style; "
                        "generalizes the reference init_adjs/init_nodes "
                        "hooks, mcmc_sampler/edm.py:291-329)")
    p.add_argument("--test_pkl", default=None,
                   help="custom test pickle path (overrides test.test_pkl)")
    p.add_argument("--skip_eval", action="store_true")
    p.add_argument("--data_root", default=".")
    p.add_argument("-o", "--override", action="append", default=[],
                   metavar="KEY=VALUE")
    return p


_OVERRIDE_KEYS = ["seed", "max_node_num", "eval_size", "lr_init",
                  "max_epoch", "sample_interval", "save_interval", "subset",
                  "num_steps", "node_encoding", "edge_encoding", "self_cond",
                  "iou_loss_type", "iou_loss_weight", "resume"]

# backbone keys a scalar CLI flag may override; list-valued config entries
# must be single-element, like the reference (arg_parser.py:233-246)
_MODEL_OVERRIDE_KEYS = ["feature_dims", "window_size", "patch_size"]


def config_from_args(args, mode: str = "train") -> ConfigDict:
    overrides = {}
    for key in _OVERRIDE_KEYS:
        val = getattr(args, key, None)
        if val is not None:
            overrides[key] = val
    # batch_size lives under both train: and test:; the reference applies a
    # train-mode flag to both sections, eval-mode to test only
    # (arg_parser.py:216-224, 248-268)
    if getattr(args, "batch_size", None) is not None:
        overrides["test.batch_size"] = args.batch_size
        if mode == "train":
            overrides["train.batch_size"] = args.batch_size
    if getattr(args, "dataset_name", None):
        overrides["dataset.name"] = args.dataset_name
    for item in getattr(args, "override", []):
        k, v = item.split("=", 1)
        overrides[k] = v
    cfg = load_config(args.config_file, overrides=overrides)
    for key in _MODEL_OVERRIDE_KEYS:
        val = getattr(args, key, None)
        if val is None:
            continue
        old = cfg.model[key]
        if isinstance(old, list):
            assert len(old) == 1, (
                f"--{key} can only replace a single-element list, got {old}")
            val = [val]
        cfg.model[key] = val
        import logging
        logging.info("config override: model.%s: %r -> %r", key, old, val)
    if getattr(args, "dp", False) or getattr(args, "ddp", False):
        import logging
        logging.info("--dp/--ddp accepted but ignored: data parallelism is "
                     "automatic SPMD over jax.devices()")
    if getattr(args, "node_only", False):
        cfg.train.node_only = True
    if getattr(args, "binary_edge", False):
        cfg.train.binary_edge = True
    return cfg


def find_eval_config(model_path: str) -> str:
    """Locate config.yaml relative to a checkpoint path
    (reference: arg_parser.py:146-153 reads ../config.yaml)."""
    candidates = [
        os.path.join(model_path, "config.yaml"),
        os.path.join(model_path, "..", "config.yaml"),
        os.path.join(model_path, "..", "..", "config.yaml"),
    ]
    for c in candidates:
        if os.path.isfile(c):
            return os.path.abspath(c)
    raise FileNotFoundError(f"no config.yaml found near {model_path}")
