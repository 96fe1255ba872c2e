"""Training entry point: python -m diffusesg_tpu.cli.train -c cfg.yaml [...]

Counterpart of the reference train entry (reference: DiffuseSG/train.py:77-120):
init basics -> load data -> build model/optimizer/EMAs/loss/sampler -> train.
On multi-host TPU pods, launch one process per host; the rendezvous is
jax.distributed.initialize (parallel/distributed.py), honoring the same
torchrun/OMPI env vars the reference reads (dist_training.py:100-126).
"""
from __future__ import annotations

import logging
import os

import jax


def main(argv=None):
    # multi-host bootstrap FIRST: must precede any device use
    from ..parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed()

    from .common import build_train_parser, config_from_args
    from ..data import load_data
    from ..models import build_model, count_params
    from ..models.factory import init_params
    from ..sampling import get_mc_sampler
    from ..train import (
        create_train_state, go_training, make_eval_step, make_optimizer,
        make_train_step, train_step_config_from,
    )
    from ..utils import set_seed_and_logger, backup_code, ScalarWriter
    from ..utils.checkpoint import restore_checkpoint
    from ..parallel.mesh import is_main_process

    args = build_train_parser().parse_args(argv)
    config = config_from_args(args, "train")
    set_seed_and_logger(config, mode="train", comment=args.comment,
                        log_level=args.log_level)
    backup_code(config.logdir)

    bundle = load_data(config, eval_mode=False, data_root=args.data_root)
    model = build_model(config)
    params = init_params(model, config, jax.random.PRNGKey(config.seed))
    logging.info("model parameters: %s", f"{count_params(params):,}")

    # steps the schedule counts per epoch must equal the steps the loop RUNS
    # per epoch: each host iterates its own ceil(n/P)-row shard in per-host
    # batches (the same split the trainer makes), with a repeat-padded (not
    # dropped) final partial batch — floor(n/global_bs) would decay the
    # per-epoch exponential LR too slowly on multi-host and with ragged
    # datasets (reference: one scheduler.step() per epoch,
    # trainer_node_adj.py:233)
    from ..data.loader import Batches
    from ..parallel.mesh import make_mesh, per_host_batch_size
    mesh_size = make_mesh(
        config.tpu.get("num_devices", 0) if "tpu" in config else 0).size
    host_bs = per_host_batch_size(config.train.batch_size, mesh_size)
    # len(Batches) is the AUTHORITATIVE per-epoch step count (shard +
    # repeat-to-fill semantics live in one place, the loader the trainer
    # actually iterates)
    steps_per_epoch = max(1, len(Batches(
        bundle.train, host_bs, process_index=jax.process_index(),
        process_count=jax.process_count())))
    optimizer = make_optimizer(config.train.lr_init, config.train.lr_dacey,
                               steps_per_epoch, config.train.weight_decay)
    state = create_train_state(params, list(config.train.ema_coef), optimizer)

    start_epoch = 0
    if config.train.get("resume"):
        resume = config.train.resume
        # a run dir (or its models_ckpt/) resolves to its NEWEST checkpoint —
        # preempt included — so `--resume <run_dir>` restarts a preempted job
        continue_epochs = False
        from ..utils.checkpoint import is_finalized_checkpoint, latest_checkpoint
        for cand in (os.path.join(resume, "models_ckpt"), resume):
            if os.path.isdir(cand) and not is_finalized_checkpoint(cand):
                newest = latest_checkpoint(cand)
                if newest is not None:
                    resume = newest
                    continue_epochs = True  # run-dir resume = "continue me"
                    break
        logging.info("resuming from %s", resume)
        payload = restore_checkpoint(resume, state)
        from ..utils.checkpoint import state_from_payload
        state = state_from_payload(payload)
        extra = payload.get("extra", {})
        # epoch numbering continues for run-dir resumes and preemption
        # checkpoints; an EXPLICIT checkpoint path keeps the reference's
        # semantics (train max_epoch fresh epochs from the restored state,
        # learning_utils.py:95-98)
        if continue_epochs or extra.get("preempted"):
            start_epoch = int(extra.get("epoch", -1)) + 1
            logging.info("continuing at epoch %d", start_epoch)

    step_cfg = train_step_config_from(config)
    train_step = make_train_step(model.apply, optimizer, step_cfg)
    eval_step = make_eval_step(model.apply, step_cfg)
    mc_sampler = get_mc_sampler(config)
    writer = ScalarWriter(config.logdir, enabled=is_main_process())

    go_training(model, state, train_step, eval_step, config, bundle,
                optimizer=optimizer, step_cfg=step_cfg,
                mc_sampler=mc_sampler, writer=writer, start_epoch=start_epoch)
    writer.close()
    logging.info("training complete")


if __name__ == "__main__":
    main()
