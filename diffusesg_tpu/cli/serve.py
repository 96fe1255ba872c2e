"""Serving entry point: python -m diffusesg_tpu.cli.serve -p <ckpt-or-run-dir>

Three modes (no reference counterpart — the reference's only inference
path is the offline eval run, DiffuseSG/eval.py):

* serve from a checkpoint (default): restore weights, jit the end-to-end
  sampler+decode, warm it up, open the HTTP endpoint;
* ``--export_to DIR``: AOT-export the compiled sampler to a portable
  artifact (jax.export StableHLO) and exit;
* ``--from_artifact DIR``: serve a previously exported artifact — no
  checkpoint, no model build, just load-and-run.
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def build_serve_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("diffusesg-serve")
    p.add_argument("-p", "--model_path", default=None,
                   help="checkpoint file or run dir (with models_ckpt/)")
    p.add_argument("-c", "--config_file", default=None)
    p.add_argument("--from_artifact", default=None,
                   help="serve a jax.export artifact dir instead of a ckpt")
    p.add_argument("--export_to", default=None,
                   help="export the sampler artifact to this dir and exit")
    p.add_argument("--port", type=int, default=8472)
    p.add_argument("--batch_size", type=int, default=None,
                   help="compiled serving batch (default: config test batch)")
    p.add_argument("--devices", type=int, default=0,
                   help="local devices to serve on: 0 = auto (all local "
                        "devices when the batch divides evenly), 1 = single "
                        "chip, N = a fixed N-device data mesh")
    p.add_argument("--num_steps", type=int, default=None,
                   help="sampling steps (default: config.mcmc.num_steps)")
    p.add_argument("--ema", default=None,
                   help="EMA beta to serve (e.g. 0.9999); 'none' = raw weights;"
                        " default: largest beta (the reference's in-training"
                        " sampling choice, trainer_node_adj.py:262-284)")
    p.add_argument("--data_root", default=None,
                   help="dataset root for label-name lookup (optional)")
    p.add_argument("--linger_ms", type=float, default=10.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-o", "--override", action="append", default=[],
                   help="config override key=value")
    return p


def _resolve_mesh(ndev_flag: int, batch: int):
    """--devices -> (mesh | None, ndev): 0 = auto (all local devices when the
    batch divides evenly), 1 = single device, N = fixed N-device mesh."""
    import jax
    from ..parallel.mesh import make_mesh

    local_devs = jax.local_devices()  # a serving process drives ITS devices
    local = len(local_devs)
    if ndev_flag == 0:
        ndev = local if (local > 1 and batch % local == 0) else 1
    else:
        ndev = ndev_flag
        if ndev > local:
            raise SystemExit(f"--devices {ndev} but only {local} local devices")
        if batch % ndev:
            raise SystemExit(f"--batch_size {batch} must be divisible by "
                             f"--devices {ndev}")
    return (make_mesh(ndev, devices=local_devs) if ndev > 1 else None), ndev


def _load_from_checkpoint(args, build_fns: bool = True):
    """Restore weights and build the (possibly mesh-sharded) serving fns.

    Returns (serve_fn, complete_fn, batch, max_node_num, config,
    (num_node_types, num_edge_types), (model, params, sampler, mesh,
    spmd_mode)) — the trailing bundle feeds the --export_to path, which
    passes ``build_fns=False`` so no live serving fns (or their replicated
    parameter placements) are constructed just to be discarded."""
    import jax
    from ..config import load_config
    from ..models import build_model
    from ..sampling import get_mc_sampler
    from ..serving.export import (make_completion_fn, make_serving_fn,
                                  make_sharded_completion_fn,
                                  make_sharded_serving_fn)
    from ..train.train_state import ema_slice
    from ..utils.checkpoint import latest_checkpoint, restore_checkpoint
    from .common import find_eval_config

    config_file = args.config_file or find_eval_config(args.model_path)
    overrides = {}
    if args.num_steps is not None:
        overrides["num_steps"] = args.num_steps
    for item in args.override:
        k, v = item.split("=", 1)
        overrides[k] = v
    config = load_config(config_file, overrides=overrides)

    ckpt_path = args.model_path
    if os.path.isdir(os.path.join(ckpt_path, "models_ckpt")):
        newest = latest_checkpoint(os.path.join(ckpt_path, "models_ckpt"))
        if newest is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_path}")
        ckpt_path = newest
    payload = restore_checkpoint(ckpt_path)
    betas = np.asarray(payload["ema_betas"])
    if args.ema == "none":
        params = payload["params"]
        chosen = "raw"
    else:
        idx = (int(np.argmin(np.abs(betas - float(args.ema))))
               if args.ema else int(np.argmax(betas)))
        params = ema_slice(payload["ema_params"], idx)
        chosen = f"{float(betas[idx]):.4f}"
    logging.info("serving %s (ema=%s)", ckpt_path, chosen)

    model = build_model(config)
    sampler = get_mc_sampler(config)
    batch = int(args.batch_size or config.test.batch_size
                or config.train.batch_size)
    mesh, ndev = _resolve_mesh(args.devices, batch)
    from ..parallel.mesh import resolve_spmd_mode
    spmd_mode = resolve_spmd_mode(config, ndev if mesh is not None else 1)
    serve_fn = complete_fn = None
    if build_fns and mesh is not None:
        logging.info("serving on a %d-device data mesh (spmd_mode=%s)",
                     ndev, spmd_mode)
        # replicate ONCE; the builders' internal replicate_tree is a no-op
        # device_put on an already-replicated tree, so generation and
        # completion share one on-device parameter copy
        from ..parallel.mesh import replicate_tree
        params = replicate_tree(params, mesh)
        serve_fn = make_sharded_serving_fn(model, params, sampler, config,
                                           mesh, spmd_mode)
        complete_fn = make_sharded_completion_fn(model, params, sampler,
                                                 config, mesh, spmd_mode)
    elif build_fns:
        serve_fn = jax.jit(make_serving_fn(model, params, sampler, config))
        complete_fn = jax.jit(make_completion_fn(model, params, sampler, config))
    from ..models.channels import resolve_sampling_channels
    info = resolve_sampling_channels(config)
    bounds = (int(info["raw_num_node_type"]),
              int(info["raw_num_adj_type"] if not info["flag_binary_edge"] else 2))
    return (serve_fn, complete_fn, batch,
            int(config.dataset.max_node_num), config, bounds,
            (model, params, sampler, mesh, spmd_mode))


def main(argv=None):
    from ..serving.server import BatchingSampler, serve

    args = build_serve_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    idx_to_word = None
    config = None
    complete_fn = None  # artifact mode serves generation only (HTTP 501)
    bounds = (None, None)
    if args.from_artifact:
        from ..serving.export import load_artifact
        fn, meta = load_artifact(args.from_artifact)
        batch, max_n = int(meta["batch_size"]), int(meta["max_node_num"])
        if args.devices not in (0, int(meta.get("num_devices", 1))):
            logging.warning(
                "--devices %d ignored: the artifact is a fixed SPMD program "
                "over %d device(s); re-export with a matching mesh to change "
                "the topology", args.devices, int(meta.get("num_devices", 1)))
        logging.info("loaded artifact %s (%s)", args.from_artifact, meta)
    else:
        if not args.model_path:
            raise SystemExit("need -p/--model_path or --from_artifact")
        (fn, complete_fn, batch, max_n, config, bounds,
         (model, params, sampler, mesh, spmd_mode)) = _load_from_checkpoint(
             args, build_fns=not args.export_to)

    if args.export_to:
        if config is None:
            raise SystemExit("--export_to needs a checkpoint, not an artifact")
        from ..serving.export import export_sampler, save_artifact
        # SPMD export only on an EXPLICIT --devices N>1: an N-device artifact
        # refuses to load on fewer chips, so auto mode must not silently
        # break the portable single-device default
        export_mesh = mesh if args.devices > 1 else None
        exported = export_sampler(model, params, sampler, config, batch,
                                  mesh=export_mesh, spmd_mode=spmd_mode)
        save_artifact(args.export_to, exported, config, batch)
        logging.info("exported sampler artifact to %s (%d device(s))",
                     args.export_to, int(exported.nr_devices))
        return

    if args.data_root is not None and config is not None:
        try:
            from ..data import load_data
            bundle = load_data(config, eval_mode=True, data_root=args.data_root)
            idx_to_word = bundle.idx_to_word
        except Exception as e:
            logging.warning("label-name lookup unavailable: %s", e)

    batcher = BatchingSampler(fn, batch, max_n, base_seed=args.seed,
                              linger_ms=args.linger_ms,
                              complete_fn=complete_fn,
                              num_node_types=bounds[0],
                              num_edge_types=bounds[1])
    logging.info("warming up (first XLA compile)...")
    batcher.warmup()
    httpd = serve(batcher, args.port, idx_to_word)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        batcher.close()


if __name__ == "__main__":
    main()
