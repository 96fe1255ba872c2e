"""Training orchestrator: the epoch loop.

Counterpart of the reference trainer (reference:
DiffuseSG/runner/trainer/trainer_node_adj.py:185-289 node_adj_go_training +
trainer_utils.py): epoch loop over host-sharded batches, per-interval test
pass on the smallest-beta EMA, best/rolling checkpoints, loss logging, and
in-training sampling with the largest-beta EMA.
"""
from __future__ import annotations

import logging
import os
import sys
import time

import jax
import numpy as np

from ..data.loader import Batches, prefetch_to_device
from ..train.train_state import TrainState, ema_slice
from ..utils.checkpoint import save_checkpoint, wait_for_async_saves
from ..utils.logging_utils import LossTxtLogger, ScalarWriter


def go_training(model, state: TrainState, train_step, eval_step, config, bundle,
                mc_sampler=None, writer: ScalarWriter | None = None,
                optimizer=None, step_cfg=None, start_epoch: int = 0):
    """Run the full training loop; returns the final TrainState.

    ``config.tpu.spmd_mode`` picks the multi-device strategy: "gspmd"
    (default — pjit + NamedSharding, ZeRO-1 state) or "shard_map" (explicit
    per-shard execution that carries the Pallas kernels to multi-chip,
    parallel/shardmap_dp.py; requires ``optimizer`` + ``step_cfg``).

    ``start_epoch`` continues an interrupted run (cli/train.py --resume).

    Preemption safety (no reference counterpart — cloud TPUs are
    preemptible): on SIGTERM/SIGINT the loop finishes the current step
    (single-process; multi-host waits for the epoch boundary so all hosts
    leave their collectives together), writes ``models_ckpt/preempt`` with
    the epoch to re-run, and returns cleanly.  ``--resume <run_dir>``
    restores the newest checkpoint, preempt included.
    """
    # imported here to avoid a train <-> parallel circular import
    from ..parallel.mesh import (is_main_process, make_mesh,
                                 per_host_batch_size, shard_batch, sync_hosts)
    from ..parallel.sharded_step import (
        make_sharded_eval_step, make_sharded_train_step, shard_train_state,
    )
    from ..sampling.orchestrator import sg_go_sampling
    mesh = make_mesh(config.tpu.get("num_devices", 0) if "tpu" in config else 0)
    logging.info("training on %d device(s), %d host(s)", mesh.size, jax.process_count())

    # config.train.batch_size is the GLOBAL batch (reference DDP splits it
    # per rank, dataloader.py:24-33); each host feeds its share, padded to
    # local-device divisibility
    batch_size = per_host_batch_size(config.train.batch_size, mesh.size)
    train_batches = Batches(bundle.train, batch_size, shuffle=True, seed=config.seed,
                            process_index=jax.process_index(),
                            process_count=jax.process_count())
    test_batches = Batches(bundle.test, batch_size, shuffle=False,
                           process_index=jax.process_index(),
                           process_count=jax.process_count())

    from ..parallel.mesh import resolve_spmd_mode
    spmd_mode = resolve_spmd_mode(config, mesh.size)
    if spmd_mode == "shard_map" and mesh.size > 1:
        if optimizer is None or step_cfg is None:
            raise ValueError("spmd_mode=shard_map needs optimizer + step_cfg "
                             "passed to go_training")
        from ..parallel.mesh import replicate_tree
        from ..parallel.shardmap_dp import (
            make_shardmap_eval_step, make_shardmap_train_step,
        )
        state = replicate_tree(state, mesh)
        sharded_step = make_shardmap_train_step(model.apply, optimizer,
                                                step_cfg, mesh)
        jit_eval = make_shardmap_eval_step(model.apply, step_cfg, mesh)
    else:
        state = shard_train_state(state, mesh)
        sharded_step = make_sharded_train_step(
            train_step, state, mesh,
            adj_ndim=bundle.train.adjs.ndim, node_ndim=bundle.train.nodes.ndim,
            flags_ndim=bundle.train.node_flags.ndim)
        jit_eval = make_sharded_eval_step(
            eval_step, mesh,
            adj_ndim=bundle.train.adjs.ndim, node_ndim=bundle.train.nodes.ndim,
            flags_ndim=bundle.train.node_flags.ndim)

    # multi-process: align every process's FIRST dispatch of the two heavy
    # programs (AOT compile, coordination barrier, then execute) — a new
    # program's Gloo clique init has a fixed ~30 s KV deadline that peer
    # compile skew otherwise blows (parallel/distributed.FencedJit)
    if jax.process_count() > 1:
        from ..parallel.distributed import FencedJit
        sharded_step = FencedJit(sharded_step, "fence_train_step")
        jit_eval = FencedJit(jit_eval, "fence_eval_step")

    loss_txt = LossTxtLogger(config.logdir, enabled=is_main_process())
    lowest = {"epoch": -1, "loss": float("inf")}
    save_interval = config.train.save_interval
    sample_interval = config.train.sample_interval
    # NO per-process offset: the step key is declared replicated to the jit
    # (GSPMD) / shard_map programs, so every host must pass the SAME value —
    # noise decorrelation comes from the global batch shard (GSPMD) or the
    # per-device fold_in(axis_index) (shard_map), not from the key.
    # start_epoch folds in so a resumed run draws a DISJOINT sigma/noise
    # stream instead of replaying the epochs consumed before preemption.
    rng = jax.random.fold_in(jax.random.PRNGKey(config.seed + 1000),
                             start_epoch)

    # device_get with multi-host-aware gathering of non-addressable leaves
    from ..parallel.mesh import fetch_to_host as _fetch_metrics

    def _pad_batch(arrs):
        """Repeat-pad a trailing partial batch to the full size so the
        compiled step shape stays static (XLA-friendly; matches the
        reference's repeat-to-fill trick in spirit)."""
        n = arrs[0].shape[0]
        if n == batch_size:
            return arrs, n
        reps = -(-batch_size // n)
        return tuple(np.concatenate([a] * reps, 0)[:batch_size] for a in arrs), n

    # graceful-preemption flag: flipped by SIGTERM/SIGINT, acted on at the
    # next safe point (signal handlers only install on the main thread)
    preempt = {"flag": False, "broke_mid_epoch": False}

    def _on_signal(signum, frame):
        preempt["flag"] = True
        logging.warning("signal %d: will checkpoint and exit at the next "
                        "safe point", signum)

    import signal as _signal
    old_handlers = {}
    try:
        for sig in (_signal.SIGTERM, _signal.SIGINT):
            old_handlers[sig] = _signal.signal(sig, _on_signal)
    except ValueError:
        old_handlers = {}

    def _restore_handlers():
        for sig, h in old_handlers.items():
            _signal.signal(sig, h)

    try:
        for epoch in range(start_epoch, config.train.max_epoch):
            train_batches.set_epoch(epoch)
            t0 = time.time()

            # no per-step host sync: metrics stay on device and are fetched ONCE
            # at epoch end (the reference blocks every step via .cpu()/.item(),
            # trainer_utils.py:36-58 — a TPU-first loop keeps the pipeline full)
            ep_metrics = []

            def _put(item):
                adjs, nodes, flags, _ids = item
                padded, _ = _pad_batch((adjs, nodes, flags))
                return shard_batch(padded, mesh)

            # double-buffered prefetch: the next batch's H2D copy overlaps the
            # current step's compute (device_put is async on TPU)
            for batch in prefetch_to_device(train_batches, _put):
                rng, sub = jax.random.split(rng)
                state, metrics = sharded_step(state, sub, *batch)
                ep_metrics.append(metrics)
                if preempt["flag"] and jax.process_count() == 1:
                    # single-process: stop mid-epoch (multi-host must reach the
                    # epoch boundary so every host exits its collectives in step)
                    preempt["broke_mid_epoch"] = True
                    break

            fetched = _fetch_metrics(ep_metrics)  # single blocking transfer
            dt = time.time() - t0
            ep_loss_a = float(np.mean([m["loss_adj"] for m in fetched])) if fetched else 0.0
            ep_loss_x = float(np.mean([m["loss_node"] for m in fetched])) if fetched else 0.0
            if is_main_process():
                for m in fetched:
                    loss_txt.write("train", epoch, m["sigmas"],
                                   m["loss_adj_per_sample"],
                                   m["loss_node_per_sample"])
            logging.info("epoch %05d | train loss adj %.6f node %.6f | %.1fs",
                         epoch, ep_loss_a, ep_loss_x, dt)
            if writer is not None:
                writer.add_scalar("train_epoch/regression_loss_adj", ep_loss_a, epoch)
                writer.add_scalar("train_epoch/regression_loss_node", ep_loss_x, epoch)
                writer.add_scalar("train_epoch/time_s", dt, epoch)

            # graceful preemption: checkpoint and leave (all hosts must agree
            # before the collective save — one host may get the signal first)
            flag = preempt["flag"]
            if jax.process_count() > 1:
                from ..parallel.mesh import gather_to_host as _gth
                flag = bool(_gth(np.asarray([flag])).any())
            if flag:
                resume_epoch = epoch - 1 if preempt["broke_mid_epoch"] else epoch
                save_checkpoint(os.path.join(config.model_ckpt_dir, "preempt"),
                                state, extra={"epoch": resume_epoch,
                                              "preempted": True})
                logging.warning("preempted: saved models_ckpt/preempt "
                                "(resume re-runs from epoch %d)", resume_epoch + 1)
                loss_txt.close()
                return state  # the finally below restores the handlers

            # test pass + checkpointing (reference: trainer_node_adj.py:238-254)
            if epoch % save_interval == save_interval - 1 or epoch == 0:
                test_params = ema_slice(state.ema_params, 0)  # smallest beta
                test_metrics = []
                for adjs, nodes, flags, _ids in test_batches:
                    (adjs, nodes, flags), n_real = _pad_batch((adjs, nodes, flags))
                    batch = shard_batch((adjs, nodes, flags), mesh)
                    rng, sub = jax.random.split(rng)
                    test_metrics.append((jit_eval(test_params, sub, *batch),
                                         n_real))
                fetched = _fetch_metrics([t for t, _ in test_metrics])

                def _trim_pads(v, n_real):
                    """Drop the repeat-pad rows of a gathered per-sample
                    array: every host padded its LOCAL tail from n_real to
                    the full local batch (shards are equal length, so n_real
                    agrees across hosts), and shard_batch concatenated the
                    host slices — the reference's test mean covers exactly
                    the dataset, with no duplicate rows."""
                    v = np.asarray(v)
                    n_proc = jax.process_count()
                    if n_proc > 1:
                        return v.reshape((n_proc, -1) + v.shape[1:])[:, :n_real].reshape(
                            (-1,) + v.shape[1:])
                    return v[:n_real]

                sums_a, sums_x, count = 0.0, 0.0, 0
                for (t, n_real) in zip(fetched, (n for _, n in test_metrics)):
                    la = _trim_pads(t["loss_adj_per_sample"], n_real)
                    lx = _trim_pads(t["loss_node_per_sample"], n_real)
                    sums_a += float(np.sum(la))
                    sums_x += float(np.sum(lx))
                    count += len(la)
                    if is_main_process():
                        loss_txt.write("test", epoch,
                                       _trim_pads(t["sigmas"], n_real), la, lx)
                te_loss_a = sums_a / max(count, 1)
                te_loss_x = sums_x / max(count, 1)
                te_loss = te_loss_a + te_loss_x
                logging.info("epoch %05d | test loss %.6f", epoch, te_loss)
                if writer is not None:
                    writer.add_scalar("test_epoch/regression_loss_adj", te_loss_a, epoch)
                    writer.add_scalar("test_epoch/regression_loss_node", te_loss_x, epoch)

                # every process joins: the ZeRO-1 leaf gather and orbax's save
                # barriers are collectives (orbax does the rank-0 write gating).
                # te_loss is identical on all hosts (replicated metrics), so the
                # best-ckpt branch agrees.
                # async: the disk write overlaps the next epoch's compute
                # (the payload is already host-fetched; orbax commits with an
                # atomic rename).  tpu.async_checkpointing: false forces the
                # old blocking behavior.
                async_ckpt = bool(config.tpu.get("async_checkpointing", True)
                                  if "tpu" in config else True)
                ckpt_path = os.path.join(config.model_ckpt_dir, f"{epoch:05d}")
                save_checkpoint(ckpt_path, state,
                                extra={"epoch": epoch, "test_loss": te_loss},
                                asynchronous=async_ckpt)
                if te_loss < lowest["loss"] and epoch >= min(
                        save_interval, config.train.max_epoch - 1):
                    lowest.update(epoch=epoch, loss=te_loss)
                    save_checkpoint(os.path.join(config.model_save_dir, "best"),
                                    state, extra={"epoch": epoch, "test_loss": te_loss},
                                    asynchronous=async_ckpt)
                # a COMMITTED numeric checkpoint from this (possibly resumed)
                # run supersedes any stale models_ckpt/preempt — drop it so
                # discovery can never rank old preempt weights newest (a
                # cp -r that refreshes mtimes in traversal order could).
                # Gate on a FINALIZED save with epoch >= start_epoch: the
                # current async save may still be committing, and numeric
                # saves from BEFORE the preemption must not trigger this.
                if is_main_process():
                    pre = os.path.join(config.model_ckpt_dir, "preempt")
                    if os.path.isdir(pre):
                        from ..utils.checkpoint import (is_finalized_checkpoint,
                                                        list_checkpoints)
                        if any(os.path.basename(c).isdigit()
                               and int(os.path.basename(c)) >= start_epoch
                               and is_finalized_checkpoint(c)
                               for c in list_checkpoints(config.model_ckpt_dir)):
                            import shutil
                            shutil.rmtree(pre, ignore_errors=True)
                            logging.info("dropped superseded preempt checkpoint")
            sync_hosts(f"epoch_{epoch}")

            # in-training sampling with the largest-beta EMA
            # (reference: trainer_node_adj.py:262-284)
            if mc_sampler is not None and epoch % sample_interval == 0:
                sample_params = ema_slice(state.ema_params, -1)
                beta = float(np.asarray(jax.device_get(state.ema_betas))[-1])
                sampling_params = {
                    "model_nm": f"training_e{epoch:05d}",
                    "weight_kw": f"{beta:.3f}",
                    "model_path": os.path.join(config.model_ckpt_dir, f"{epoch:05d}")}
                sg_go_sampling(model, sample_params, mc_sampler, config, bundle,
                               epoch=epoch, eval_mode=False, sanity_check=epoch == 0,
                               sampling_params=sampling_params, writer=writer)
    finally:
        _restore_handlers()
        # capture BEFORE the try below: inside its except clause,
        # sys.exc_info() would refer to the drain exception itself and the
        # normal-path re-raise would be unreachable
        unwinding = sys.exc_info()[0] is not None
        try:
            wait_for_async_saves()  # drain any in-flight checkpoint write
        except Exception:
            # on the normal path a failed background commit must fail the
            # run (the checkpoint on disk is bad); during an exception
            # unwind it must NOT replace the original training error
            if not unwinding:
                loss_txt.close()
                raise
            logging.exception("async checkpoint drain failed during unwind")
        loss_txt.close()
    return state
