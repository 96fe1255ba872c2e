"""Evaluation entry point: python -m diffusesg_tpu.cli.eval -p <ckpt-or-run-dir>

Counterpart of the reference eval entry (reference: DiffuseSG/eval.py:80-101):
discover checkpoints, loop over (checkpoint x EMA weight), sample and compute
the full metric suite, appending rows to eval_results.csv.
"""
from __future__ import annotations

import logging
import os

import jax
import numpy as np


def select_ema_indices(betas, use_ema, ema_weights=None) -> list[int]:
    """Map --use_ema / --ema_weights to EMA-stack indices.

    Index -1 selects the raw online weights (the reference's 'model' key /
    beta "1.0").  Semantics mirror the reference's get_ema_weight_keywords
    (reference: eval.py:15-40): 'all' evaluates raw + every EMA, 'none' raw
    only, a value list selects exactly those betas with 1.0 meaning raw.
    """
    betas = np.asarray(betas)
    if isinstance(use_ema, str):
        use_ema = [use_ema]

    def _beta_idx(w: float) -> int:
        i = int(np.argmin(np.abs(betas - w)))
        if not np.isclose(float(betas[i]), w):
            raise ValueError(
                f"EMA beta {w} not found in checkpoint betas {betas}")
        return i

    if ema_weights:
        return [_beta_idx(float(w)) for w in ema_weights]
    if not use_ema or use_ema == ["none"]:
        return [-1]
    if use_ema == ["all"]:
        return [-1] + list(range(len(betas)))
    wanted = [float(w) for w in use_ema]
    idxs = [-1] if 1.0 in wanted else []
    idxs += [_beta_idx(w) for w in wanted if w != 1.0]
    return idxs


def main(argv=None):
    # multi-host bootstrap FIRST: must precede any device use
    # (reference rendezvous analogue: dist_training.py:100-126)
    from ..parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed()

    from .common import build_eval_parser, find_eval_config
    from ..config import load_config
    from ..data import load_data
    from ..models import build_model
    from ..sampling import get_mc_sampler
    from ..sampling.orchestrator import sg_go_sampling
    from ..train.train_state import ema_slice
    from ..utils import set_seed_and_logger, backup_code, ScalarWriter
    from ..utils.checkpoint import restore_checkpoint, select_checkpoints
    from ..parallel.mesh import is_main_process, sync_hosts

    args = build_eval_parser().parse_args(argv)
    config_file = args.config_file or find_eval_config(args.model_path)
    overrides = {}
    if args.batch_size is not None:
        overrides["test.batch_size"] = args.batch_size
    if args.eval_size is not None:
        overrides["eval_size"] = args.eval_size
    if args.num_steps is not None:
        overrides["num_steps"] = args.num_steps
    for item in args.override:
        k, v = item.split("=", 1)
        overrides[k] = v
    config = load_config(config_file, overrides=overrides)
    if getattr(args, "test_pkl", None):
        with config.unlocked():
            config.test.test_pkl = args.test_pkl
    set_seed_and_logger(config, mode="eval", comment=args.comment,
                        log_level=args.log_level)
    backup_code(config.logdir)  # reference backs up code on eval too (eval.py:86)

    bundle = load_data(config, eval_mode=True, data_root=args.data_root)
    model = build_model(config)
    mc_sampler = get_mc_sampler(config)
    writer = ScalarWriter(config.logdir, enabled=is_main_process())

    # checkpoint discovery (reference: arg_parser.py:144-184)
    if os.path.isdir(os.path.join(args.model_path, "models_ckpt")):
        ckpts = select_checkpoints(os.path.join(args.model_path, "models_ckpt"),
                                   args.min_epoch, args.max_epoch,
                                   args.specify_epoch, args.num_ckpts)
    else:
        ckpts = [args.model_path]
    if not ckpts:
        raise FileNotFoundError(f"no checkpoints found under {args.model_path}")
    logging.info("evaluating %d checkpoint(s)", len(ckpts))

    for ckpt_path in ckpts:
        payload = restore_checkpoint(ckpt_path)
        betas = np.asarray(payload["ema_betas"])
        idxs = select_ema_indices(betas, args.use_ema, args.ema_weights)
        for idx in idxs:
            if idx == -1:
                params = payload["params"]
                kw = "1.000"
            else:
                params = ema_slice(payload["ema_params"], idx)
                kw = f"{float(betas[idx]):.4f}"
            model_nm = os.path.basename(ckpt_path.rstrip("/"))
            if args.inpaint_frac is not None:
                # mark conditional-completion rows in the csv without
                # changing the (append-only) column schema
                model_nm += f"_inpaint{args.inpaint_frac:g}"
            sampling_params = {"model_nm": model_nm,
                               "weight_kw": kw, "model_path": ckpt_path}
            logging.info("eval ckpt=%s ema=%s", ckpt_path, kw)
            sg_go_sampling(model, params, mc_sampler, config, bundle,
                           epoch=int(payload.get("extra", {}).get("epoch", 0) or 0),
                           eval_mode=True, sanity_check=args.sanity_check,
                           sampling_params=sampling_params, writer=writer,
                           skip_eval=args.skip_eval,
                           random_node_num=args.random_node_num,
                           inpaint_frac=args.inpaint_frac)
            sync_hosts("eval_ckpt")
    writer.close()
    logging.info("evaluation complete")


if __name__ == "__main__":
    main()
