"""Sampling + evaluation orchestrator (the inference engine driver).

Counterpart of the reference sg_go_sampling
(reference: DiffuseSG/runner/sampler/sampler_node_adj.py:24-723): draws
samples with the scan sampler, decodes to integer scene graphs on device,
gathers across hosts, and on the main process computes the full metric suite
and writes npz / csv / txt artifacts with the reference's keys and columns.

Device/host boundary is clean (SURVEY hard part #3): everything up to the
quantized int tensors runs inside jit; metrics consume gathered numpy.
"""
from __future__ import annotations

import logging
import os
import time
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import split_eval_set
from ..eval import SceneGraphEvaluator
from ..models.channels import resolve_sampling_channels
from ..models.precond import precond_forward
from ..ops.box_ops import box_cxcywh_to_xyxy
from ..ops.masking import mask_nodes
from ..parallel.mesh import gather_to_host, is_main_process
from .decode import decode_samples
from .edm_sampler import NodeAdjEDMSampler


_SAMPLE_FN_CACHE: dict = {}


def _build_sample_fn(model, sampler: NodeAdjEDMSampler, num_node_chan: int,
                     num_edge_chan: int, sanity_check: bool, precond: str,
                     num_interim: int, mesh, inpaint: bool):
    """Jitted (params, rng, node_flags, ...) -> (adjs, nodes), cached per
    configuration.  Params are a CALL argument, never a closure constant:
    baking them in would embed the weight values into the HLO, so every eval
    with fresh EMA weights would miss both jit's in-memory cache and the
    persistent compile cache and pay a full (multi-minute, over the tunnel)
    recompile — measured as ~3 min per checkpoint eval before this fix."""
    key = (model, sampler, num_node_chan, num_edge_chan, sanity_check,
           precond, num_interim, mesh, inpaint)
    try:
        hit = _SAMPLE_FN_CACHE.get(key)
    except TypeError:        # unhashable component: fall back to uncached
        hit, key = None, None
    if hit is not None:
        return hit

    if sanity_check:
        # GT-as-denoiser fixture (reference: edm.py:375-377); params unused
        def sample_fn(params, rng, node_flags, gt_a, gt_x):
            def gt_denoiser(a, x, sigmas, sc_a, sc_x):
                return gt_a.astype(jnp.float32), gt_x.astype(jnp.float32)
            return sampler.sample(gt_denoiser, rng, node_flags,
                                  num_node_chan, num_edge_chan,
                                  num_interim=num_interim)
        n_in = 4
    elif inpaint:
        def sample_fn(params, rng, node_flags, gt_a, gt_x, mask_a, mask_x):
            def denoiser(a, x, sigmas, sc_a, sc_x):
                def model_fn(aa, xx, flags, c_noise, s_a, s_x):
                    return model.apply(params, aa, xx, flags, c_noise, s_a, s_x)
                return precond_forward(model_fn, precond, a, x, node_flags, sigmas,
                                       sc_a, sc_x)
            return sampler.sample(denoiser, rng, node_flags,
                                  num_node_chan, num_edge_chan,
                                  num_interim=num_interim,
                                  inpaint=dict(gt_adjs=gt_a, gt_nodes=gt_x,
                                               mask_adjs=mask_a, mask_nodes=mask_x))
        n_in = 6
    else:
        def sample_fn(params, rng, node_flags):
            def denoiser(a, x, sigmas, sc_a, sc_x):
                def model_fn(aa, xx, flags, c_noise, s_a, s_x):
                    return model.apply(params, aa, xx, flags, c_noise, s_a, s_x)
                return precond_forward(model_fn, precond, a, x, node_flags, sigmas,
                                       sc_a, sc_x)
            return sampler.sample(denoiser, rng, node_flags,
                                  num_node_chan, num_edge_chan,
                                  num_interim=num_interim)
        n_in = 2

    if mesh is None:
        jitted = jax.jit(sample_fn)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        batch0 = NamedSharding(mesh, P("data"))   # batch-major arrays
        batch1 = NamedSharding(mesh, P(None, "data"))  # interim [T+1, B, ...]
        # `repl` as a prefix sharding replicates the whole params tree
        in_sh = (repl, repl) + (batch0,) * (n_in - 1)
        out_sh = (batch0, batch0) if num_interim <= 0 else (batch0, batch0, batch1, batch1)
        jitted = jax.jit(sample_fn, in_shardings=in_sh, out_shardings=out_sh)
    if key is not None:
        _SAMPLE_FN_CACHE[key] = jitted
    return jitted


def make_sample_fn(model, params, sampler: NodeAdjEDMSampler,
                   num_node_chan: int, num_edge_chan: int,
                   sanity_check: bool = False, precond: str = "edm",
                   num_interim: int = 0, mesh=None, inpaint: bool = False):
    """Build a jittable (rng, node_flags[, gt_a, gt_x]) -> (adjs, nodes) fn.

    ``inpaint`` builds the conditional-completion variant instead:
    (rng, node_flags, gt_a, gt_x, mask_a, mask_x) -> (adjs, nodes), where
    masked-true entries of gt_a/gt_x are carried exactly through the reverse
    diffusion (the generalization of the reference's init_adjs/init_nodes
    hooks, reference: DiffuseSG/runner/mcmc_sampler/edm.py:291-329).

    ``precond`` selects the preconditioning family (config.mcmc.precond;
    reference wires it through get_mc_sampler/objective construction).
    ``num_interim`` > 0 additionally returns evenly-spaced interim snapshot
    stacks (reference: max_num_interim_adjs=10, sampler_node_adj.py:86).

    ``mesh`` enables data-parallel sampling over every addressable device:
    params are replicated, the batch axis is sharded with NamedSharding and
    XLA runs the whole reverse diffusion SPMD — the TPU-native counterpart of
    the reference's DDP eval sharding (sampler_node_adj.py:331-345 +
    DistributedSampler, dataloader.py:26-29).

    The underlying jitted program takes params as an argument and is cached
    across calls, so evaluating successive checkpoints (fresh EMA weights,
    same shapes) compiles exactly once per configuration.
    """
    if mesh is not None:
        from ..parallel.mesh import replicate_tree
        params = replicate_tree(params, mesh)
    jitted = _build_sample_fn(model, sampler, num_node_chan, num_edge_chan,
                              sanity_check, precond, num_interim, mesh, inpaint)
    return partial(jitted, params)


@lru_cache(maxsize=None)
def _cached_decode_fn(node_encoding, edge_encoding, num_node_type, num_adj_type,
                      flag_bbox, flag_node_only):
    """One jitted decode program per static configuration (a fresh
    ``jax.jit(partial(...))`` each call would re-trace per eval)."""
    return jax.jit(partial(
        decode_samples, node_encoding=node_encoding, edge_encoding=edge_encoding,
        num_node_type=num_node_type, num_adj_type=num_adj_type,
        flag_bbox=flag_bbox, flag_node_only=flag_node_only))


def resample_node_flags(flags: np.ndarray, num_nodes_pool,
                        seed: int) -> np.ndarray:
    """Resample per-slot node counts from the test set's empirical node-count
    distribution (reference: sampler_node_adj.py:146-154).  Slots are filled
    front-to-back, so every resampled mask stays non-empty like the
    reference's assert."""
    rs = np.random.RandomState(seed)
    counts = rs.choice(num_nodes_pool, size=len(flags))
    sample_flags = np.zeros_like(flags)
    for i, c in enumerate(counts):
        sample_flags[i, :c] = True
    return sample_flags


def sg_go_sampling(model, params, mc_sampler: NodeAdjEDMSampler, config, bundle,
                   epoch: int = 0, eval_mode: bool = False, sanity_check: bool = False,
                   sampling_params: dict | None = None, writer=None,
                   skip_eval: bool = False, random_node_num: bool = False,
                   rng: jax.Array | None = None,
                   inpaint_frac: float | None = None) -> dict:
    """Sample, decode, evaluate; returns the metric dict (and writes artifacts).

    ``bundle`` is the SceneGraphBundle from data.load_data (carrying the test
    split plus triplet/bbox statistics, like the reference's decorated
    test_dl).

    ``inpaint_frac`` turns the pass into CONDITIONAL COMPLETION: for every
    test graph the first ceil(n_valid * frac) valid nodes — their labels,
    boxes, and the edges among them — are pinned to ground truth and carried
    exactly through the reverse diffusion (RePaint-style, the generalization
    of the reference's init_adjs/init_nodes hooks, reference:
    DiffuseSG/runner/mcmc_sampler/edm.py:291-329); only the remainder is
    sampled.  Metrics/artifacts flow as usual over the completed graphs.
    """
    cfg_test = config.test
    flag_bbox = True
    node_encoding = config.train.node_encoding
    edge_encoding = config.train.edge_encoding

    info = resolve_sampling_channels(config)
    flag_node_only = info["flag_node_only"]
    flag_binary_edge = info["flag_binary_edge"]
    raw_num_node_type = info["raw_num_node_type"]
    raw_num_adj_type = info["raw_num_adj_type"]
    num_node_type = info["num_node_chan"]
    num_adj_type = info["num_adj_chan"]

    eval_size = cfg_test.eval_size
    test_data = bundle.test
    if eval_mode:
        total_samples = eval_size if eval_size > 0 else len(test_data)
        batch_size = cfg_test.batch_size or config.train.batch_size
    else:
        total_samples = eval_size if eval_size > 0 else config.train.batch_size
        batch_size = config.train.batch_size
    total_samples = min(len(test_data), total_samples)
    eval_set = split_eval_set(test_data, total_samples, seed=config.seed)

    # data-parallel sampling mesh.  Single process: NamedSharding over every
    # local chip.  Multi-process: each host samples its strided shard of the
    # eval set on a LOCAL mesh and results are allgathered below — the exact
    # reference DDP-eval split (sampler_node_adj.py:331-345 +
    # DistributedSampler, dataloader.py:26-29); a global mesh would force
    # every host to materialize identical global batches.
    from ..parallel.mesh import batch_sharding, make_mesh
    n_dev = config.tpu.get("num_devices", 0) if "tpu" in config else 0
    if jax.process_count() > 1:
        from ..data.loader import shard_for_process
        eval_set = shard_for_process(eval_set, jax.process_index(),
                                     jax.process_count())
        mesh = make_mesh(n_dev, devices=jax.local_devices())
        # params may arrive sharded over the GLOBAL training mesh (ZeRO-1
        # EMA leaves); gather to host (COLLECTIVE) before placing them on
        # the local sampling mesh
        from ..parallel.mesh import fetch_to_host
        params = fetch_to_host(params)
    else:
        mesh = make_mesh(n_dev)
    batch_size = -(-batch_size // mesh.size) * mesh.size
    logging.info("sampling %d graphs (batch %d, %d device(s))",
                 total_samples, batch_size, mesh.size)

    def _pad(a: np.ndarray) -> np.ndarray:
        """Repeat-pad to the full batch: keeps the compiled shape static and
        divisible by the mesh (outputs are trimmed back to the real count)."""
        if len(a) == batch_size:
            return a
        reps = -(-batch_size // len(a))
        return np.concatenate([a] * reps, 0)[:batch_size]

    def _put(a: np.ndarray):
        return jax.device_put(a, batch_sharding(mesh, np.asarray(a).ndim))

    rng = jax.random.PRNGKey(config.seed + epoch) if rng is None else rng
    if jax.process_count() > 1:
        # per-rank noise streams (reference: per-process seed offset,
        # arg_parser.py:288-312); each host samples different graphs
        rng = jax.random.fold_in(rng, jax.process_index())
    # interim snapshot cap mirrors the reference (sampler_node_adj.py:85-86)
    num_interim = min(int(config.test.get("num_interim", 10)),
                      mc_sampler.num_steps)
    if inpaint_frac is not None:
        if not (0.0 < inpaint_frac < 1.0):
            raise ValueError(f"inpaint_frac must be in (0, 1), got {inpaint_frac}")
        if flag_node_only:
            raise NotImplementedError("inpaint_frac with node_only mode")
        if sanity_check or random_node_num:
            raise ValueError("inpaint_frac is exclusive with sanity_check / "
                             "random_node_num (conditioning pins GT values "
                             "onto the GT node layout)")
    from ..parallel.mesh import resolve_spmd_mode
    spmd_mode = resolve_spmd_mode(config, mesh.size if mesh is not None else 1)
    if inpaint_frac is not None:
        # conditional completion runs through the gspmd sample fn (the
        # shard_map DP variant has no inpaint signature; single-chip and
        # NamedSharding multi-chip both work)
        sample_fn = make_sample_fn(model, params, mc_sampler, num_node_type,
                                   num_adj_type, precond=config.mcmc.get("precond", "edm"),
                                   num_interim=num_interim, mesh=mesh,
                                   inpaint=True)
    elif (spmd_mode == "shard_map" and not sanity_check and mesh is not None
            and mesh.size > 1):
        # explicit per-shard execution: carries the Pallas kernels to
        # multi-chip (GSPMD all-gathers around opaque tpu_custom_calls)
        from ..parallel.shardmap_dp import make_shardmap_sample_fn
        sample_fn = make_shardmap_sample_fn(
            model, params, mc_sampler, num_node_type, num_adj_type, mesh,
            precond=config.mcmc.get("precond", "edm"), num_interim=num_interim)
    else:
        sample_fn = make_sample_fn(model, params, mc_sampler, num_node_type,
                                   num_adj_type, sanity_check,
                                   precond=config.mcmc.get("precond", "edm"),
                                   num_interim=num_interim, mesh=mesh)
    decode_fn = _cached_decode_fn(
        node_encoding, edge_encoding, raw_num_node_type,
        (raw_num_adj_type if not flag_binary_edge else 2),
        flag_bbox, flag_node_only)

    out = {"q_adj": [], "q_node": [], "bbox": [], "flags": [], "flags_gt": [],
           "q_adj_gt": [], "q_node_gt": [], "bbox_gt": [], "image_ids": [],
           "raw_a": [], "raw_x": [], "interim_a": [], "interim_x": []}
    num_nodes_pool = np.asarray([len(g["node_labels"]) for g in test_data.pkl_data]) \
        if test_data.pkl_data else None

    t0 = time.time()
    n_batches = -(-len(eval_set) // batch_size)
    for bi in range(n_batches):
        sl = slice(bi * batch_size, (bi + 1) * batch_size)
        n_real = len(eval_set.adjs[sl])
        adjs_gt = _put(_pad(eval_set.adjs[sl]))
        nodes_gt = _put(_pad(eval_set.nodes[sl]))
        flags = _pad(np.asarray(eval_set.node_flags[sl]))
        flags_j = _put(flags)
        image_ids = eval_set.image_ids[sl]

        if "one_hot" in (node_encoding, edge_encoding):
            # deferred one-hot encoding (reference: sampler_node_adj.py:116-139)
            from ..train.train_step import TrainStepConfig, encode_one_hot_batch
            enc_cfg = TrainStepConfig(
                node_encoding=node_encoding, edge_encoding=edge_encoding,
                flag_node_only=flag_node_only,
                num_node_type=raw_num_node_type,
                num_edge_type=(2 if flag_binary_edge else raw_num_adj_type))
            adjs_gt, nodes_gt = encode_one_hot_batch(
                adjs_gt, nodes_gt, flags_j, enc_cfg)

        if random_node_num and num_nodes_pool is not None and flags.ndim == 2:
            sample_flags = resample_node_flags(flags, num_nodes_pool,
                                               config.seed + epoch + bi)
        else:
            sample_flags = flags
        sample_flags_j = _put(sample_flags)

        def _app(key, arr, dtype=None):
            """Append an output, trimmed back to the batch's real count."""
            a = np.asarray(arr)[:n_real]
            out[key].append(a.astype(dtype) if dtype is not None else a)

        rng, sub = jax.random.split(rng)
        if sanity_check:
            res_t = sample_fn(sub, sample_flags_j, adjs_gt, nodes_gt)
        elif inpaint_frac is not None:
            # the first ceil(n_valid * frac) valid nodes are known (data is
            # front-packed); edges among known nodes are known too
            known = (np.arange(flags.shape[1])[None, :]
                     < np.ceil(flags.sum(1) * inpaint_frac)[:, None])
            known &= flags.astype(bool)
            mask_a = known[:, :, None] & known[:, None, :]
            res_t = sample_fn(sub, sample_flags_j, adjs_gt, nodes_gt,
                              _put(mask_a), _put(known))
        else:
            res_t = sample_fn(sub, sample_flags_j)
        if num_interim > 0:
            adjs, nodes, interim_a, interim_x = res_t
            # keep a handful per batch (batch-major [b, T+1, ...] so the
            # host-gather/concat below treats them like every other tensor):
            # the reference holds all snapshots in memory but never persists
            # them; we save a small slice to the npz instead
            keep = min(8, n_real)
            out["interim_a"].append(np.swapaxes(np.asarray(interim_a[:, :keep]), 0, 1))
            out["interim_x"].append(np.swapaxes(np.asarray(interim_x[:, :keep]), 0, 1))
        else:
            adjs, nodes = res_t

        dec = decode_fn(adjs, nodes, sample_flags_j)
        dec_gt = decode_fn(adjs_gt, nodes_gt, flags_j)

        _app("raw_a", adjs)
        _app("raw_x", nodes)
        out["image_ids"].append(image_ids)
        if flag_node_only:
            # unpack the node attributes packed on the adj grid back to
            # vectors (reference: sampler_node_adj.py:179-191,287-300)
            from ..ops.attribute_code import reshape_node_attr_mat_to_vec
            n_allowed = info["num_allowed_nodes"]
            q_node, flags_vec = reshape_node_attr_mat_to_vec(
                dec.adj_types.astype(jnp.float32), sample_flags_j, n_allowed)
            q_node_gt, flags_gt_vec = reshape_node_attr_mat_to_vec(
                dec_gt.adj_types.astype(jnp.float32), flags_j, n_allowed)
            _app("q_node", q_node, np.int64)
            _app("q_node_gt", q_node_gt, np.int64)
            out["q_adj"].append(np.zeros((n_real, n_allowed, n_allowed), np.int64))
            out["q_adj_gt"].append(np.zeros((n_real, n_allowed, n_allowed), np.int64))
            _app("flags", flags_vec)
            _app("flags_gt", flags_gt_vec)
            if flag_bbox:
                bb, _ = reshape_node_attr_mat_to_vec(dec.bboxes, sample_flags_j, n_allowed)
                bb_gt, _ = reshape_node_attr_mat_to_vec(dec_gt.bboxes, flags_j, n_allowed)
                _app("bbox", bb)
                _app("bbox_gt", bb_gt)
        else:
            _app("q_adj", dec.adj_types)
            _app("q_adj_gt", dec_gt.adj_types)
            _app("flags", sample_flags)
            _app("flags_gt", flags)
            _app("q_node", dec.node_types)
            _app("q_node_gt", dec_gt.node_types)
            if flag_bbox:
                _app("bbox", dec.bboxes)
                _app("bbox_gt", dec_gt.bboxes)
    logging.info("sampling done in %.1fs", time.time() - t0)

    res = {k: np.concatenate(v, 0) for k, v in out.items() if v}
    # multi-host: gather every result tensor (reference: sampler_node_adj.py:331-345)
    if jax.process_count() > 1:
        # barrier BEFORE the first gather dispatch: each host just compiled
        # and ran its local sampling programs with arbitrary relative skew;
        # the gather is a NEW Gloo clique whose context init would time out
        # (~30 s KV deadline) if a peer is still sampling.  The coordination-
        # service barrier (long timeout, no Gloo) absorbs the skew first.
        from ..parallel.mesh import sync_hosts
        sync_hosts("pre_gather")
        res = {k: gather_to_host(v) for k, v in res.items()}
        # drop shard_for_process's wrap-padding: each host contributed
        # k = ceil(T/P) rows, of which the first r_p are real
        n_proc = jax.process_count()
        k_per = -(-total_samples // n_proc)
        keep = np.concatenate([
            np.arange(p * k_per,
                      p * k_per + total_samples // n_proc
                      + (1 if p < total_samples % n_proc else 0))
            for p in range(n_proc)])
        # explicit per-sample keys: interim_a/interim_x stack a capped
        # per-batch slice (min(8, n_real) rows each), so a leading-dim shape
        # match would mis-trim them whenever the counts coincide
        per_sample = {"raw_a", "raw_x", "q_adj", "q_adj_gt", "q_node",
                      "q_node_gt", "flags", "flags_gt", "bbox", "bbox_gt"}
        res = {k: (v[keep] if k in per_sample else v) for k, v in res.items()}

    if not is_main_process():
        return {}
    metrics = evaluate_samples(res, config, bundle, raw_num_node_type,
                               raw_num_adj_type, flag_node_only, flag_binary_edge,
                               flag_bbox, skip_eval)
    write_artifacts(res, metrics, config, bundle, epoch, eval_mode, sanity_check,
                    sampling_params, writer, skip_eval)
    return metrics


def evaluate_samples(res: dict, config, bundle, raw_num_node_type, raw_num_adj_type,
                     flag_node_only, flag_binary_edge, flag_bbox, skip_eval) -> dict:
    """The metric block (reference: sampler_node_adj.py:445-552)."""
    if skip_eval:
        return {}
    ev = SceneGraphEvaluator()
    kernels = ["gaussian"]
    metrics: dict = {"gen_data_size": len(res["q_adj"]),
                     "test_data_size": len(res["q_adj_gt"])}

    deg = ev.compute_node_degree_mmd(res["q_adj"], res["q_adj_gt"], kernels)
    for kname, sub in deg.items():
        for key, val in sub.items():
            metrics[f"node_{key}_mmd_{kname}"] = val
    ntm = ev.compute_node_type_mmd(res["q_node"], res["q_node_gt"], res["flags"],
                                   res["flags_gt"], raw_num_node_type, kernels)
    for kname, val in ntm.items():
        metrics[f"node_type_mmd_{kname}"] = val
    etm = ev.compute_edge_type_mmd(res["q_adj"], res["q_adj_gt"], res["flags"],
                                   res["flags_gt"],
                                   raw_num_adj_type if not flag_binary_edge else 2,
                                   kernels)
    for kname, val in etm.items():
        metrics[f"edge_type_mmd_{kname}"] = val
    if not flag_node_only:
        for tag, tdict in [("val", bundle.test_triplet_dict),
                           ("train", bundle.train_triplet_dict)]:
            rej, all_, full, novelty = ev.compute_triplet_tv_dist(
                res["q_adj"], res["q_node"], res["flags"],
                tdict, bundle.test_triplet_dict)
            metrics[f"triplet_tv_dist_rej_{tag}"] = rej
            metrics[f"triplet_tv_dist_all_{tag}"] = all_
            metrics[f"triplet_tv_dist_full_{tag}"] = full
            metrics[f"triplet_novelty_{tag}"] = novelty

    if flag_bbox and "bbox" in res:
        pred_bbox = np.clip(np.asarray(box_cxcywh_to_xyxy(jnp.asarray(res["bbox"]))), 0, 1)
        gt_bbox = np.clip(np.asarray(box_cxcywh_to_xyxy(jnp.asarray(res["bbox_gt"]))), 0, 1)
        for prefix, bbox, flags in [("pred", pred_bbox, res["flags"]),
                                    ("gt", gt_bbox, res["flags_gt"])]:
            metrics[f"{prefix}_iou_blt"] = ev.compute_bbox_ioa(
                bbox, flags, flag_vanilla_iou=True, return_mean=True)
            metrics[f"{prefix}_iou_percp_blt"] = ev.compute_bbox_ioa(
                bbox, flags, canvas_size=32, flag_perceptual_iou=True, return_mean=True)
            metrics[f"{prefix}_overlap_blt"] = ev.compute_bbox_ioa(
                bbox, flags, flag_overlap=True, return_mean=True)
            metrics[f"{prefix}_alignment_blt"] = ev.compute_bbox_ioa(
                bbox, flags, flag_alignment=True, return_mean=True)

        # F1 with vanilla / area / freq weights (sampler_node_adj.py:507-552)
        area_stat = bundle.bbox_area_stat
        freq_stat = bundle.bbox_freq_stat
        w_area = np.asarray([area_stat[k] for k in sorted(area_stat)], np.float64)
        w_area = w_area / w_area.sum()
        w_freq = np.asarray([freq_stat[k] for k in sorted(freq_stat)], np.float64)
        w_freq = w_freq / w_freq.sum()
        weights = [np.ones_like(w_area), w_area, w_freq]
        mat_f1 = ev.compute_bbox_f1(pred_bbox, res["q_node"], res["flags"],
                                    gt_bbox, res["q_node_gt"], res["flags_gt"],
                                    class_weight_ls=weights)
        dummy_gen = mask_nodes(jnp.ones_like(jnp.asarray(res["q_node"], jnp.float32)),
                               jnp.asarray(res["flags"]))
        dummy_gt = mask_nodes(jnp.ones_like(jnp.asarray(res["q_node_gt"], jnp.float32)),
                              jnp.asarray(res["flags_gt"]))
        mat_f1_nt = ev.compute_bbox_f1(pred_bbox, np.asarray(dummy_gen), res["flags"],
                                       gt_bbox, np.asarray(dummy_gt), res["flags_gt"])
        mats = {"vanilla": mat_f1[..., 0], "area": mat_f1[..., 1],
                "freq": mat_f1[..., 2], "no_node_type": mat_f1_nt[..., 0]}
        for name, mat in mats.items():
            metrics[f"{name}_f1_avg_max"] = float(mat.max(-1).mean())
            metrics[f"{name}_f1_avg_mean"] = float(mat.mean(-1).mean())
            metrics[f"{name}_f1_avg_median"] = float(np.median(mat, -1).mean())
        metrics["_mat_f1"] = mats
    for k, v in metrics.items():
        if not k.startswith("_"):
            logging.info("metric %s = %s", k, v)
    return metrics


def write_artifacts(res, metrics, config, bundle, epoch, eval_mode, sanity_check,
                    sampling_params, writer, skip_eval) -> None:
    """npz dumps, eval_results.csv, scene-graph txt, TB scalars
    (reference: sampler_node_adj.py:353-720)."""
    stamp = "eval_" + (time.strftime("%b-%d-%H-%M-%S") if eval_mode
                       else f"epoch_{epoch:05d}")
    sub = "sampling_during_evaluation" if eval_mode else "sampling_during_training"
    mode_tag = "sanity_check" if sanity_check else "model_inference"
    outdir = os.path.join(config.logdir, sub, f"{stamp}_{mode_tag}")
    os.makedirs(outdir, exist_ok=True)

    npz_payload = dict(
        samples_node_flags=res["flags"].astype(bool),
        samples_a=res["q_adj"], raw_a=res["raw_a"], raw_x=res["raw_x"],
        gt_node_flags=res["flags_gt"].astype(bool), gt_a=res["q_adj_gt"],
        gt_image_ids=res["image_ids"])
    if "q_node" in res:
        npz_payload.update(samples_x=res["q_node"], gt_x=res["q_node_gt"])
    if "bbox" in res:
        npz_payload.update(samples_x_bbox=res["bbox"], gt_x_bbox=res["bbox_gt"])
    if "interim_a" in res:
        # interim denoising snapshots, batch-major [b, T+1, ...]
        # (reference collects these per sample run, sampler_node_adj.py:166-172)
        npz_payload.update(interim_a=res["interim_a"], interim_x=res["interim_x"])
    np.savez_compressed(os.path.join(outdir, "final_samples_array_before_eval.npz"),
                        **npz_payload)
    if skip_eval:
        return

    # dataset-statistics dashboard (reference: sampler_node_adj.py:417-435)
    try:
        from ..eval.sg_statistics import compute_sg_statistics
        compute_sg_statistics(npz_payload, bundle.test.pkl_data,
                              bundle.idx_to_word, outdir)
    except Exception as e:
        logging.warning("sg statistics report failed: %s", e)

    if metrics.get("_mat_f1"):
        for name, mat in metrics["_mat_f1"].items():
            npz_payload[f"mat_f1_{name}"] = mat
    np.savez_compressed(os.path.join(outdir, "final_samples_array.npz"), **npz_payload)

    if writer is not None:
        for key, val in metrics.items():
            if not key.startswith("_") and np.isscalar(val):
                writer.add_scalar(f"gen_epoch/{key}", float(val), epoch)

    # append-only CSV (reference: sampler_node_adj.py:621-696)
    row = {"model_nm": (sampling_params or {}).get("model_nm", f"epoch_{epoch:05d}"),
           "weight_kw": (sampling_params or {}).get("weight_kw", ""),
           "model_path": (sampling_params or {}).get("model_path", "")}
    row.update({k: v for k, v in metrics.items() if not k.startswith("_")})
    import pandas as pd
    df = pd.DataFrame([row])
    csv_path = os.path.join(config.logdir, "eval_results.csv")
    df.to_csv(csv_path, header=not os.path.exists(csv_path), index=False, mode="a")

    # human-readable scene graphs (reference: sampler_node_adj.py:698-720)
    if "q_node" in res:
        _write_scene_graph_txt(os.path.join(outdir, "gen_scene_graph.txt"),
                               res["q_adj"], res["q_node"], res["flags"],
                               bundle.idx_to_word)

    # scene-graph visualizations (reference: sampler_node_adj.py:389-390,554-573)
    try:
        from ..utils.visual import (plot_graphs_adj, plot_scene_graph,
                                    plot_scene_graph_bbox)
        if "q_node" in res:
            plot_scene_graph(res["q_node"], res["q_adj"], res["flags"],
                             bundle.idx_to_word, save_dir=outdir,
                             title=f"{stamp}_{mode_tag}.png", num_plots=8)
        if "interim_a" in res:
            # denoising-trajectory grid for the first sample: one adjacency
            # heatmap per interim snapshot (channel 0 if multi-channel)
            traj = res["interim_a"][0]
            if traj.ndim == 4:
                traj = traj[..., 0]
            plot_graphs_adj(traj, save_dir=outdir,
                            title=f"interim_{stamp}_{mode_tag}.png",
                            num_plots=len(traj))
        # retrieval panels: generated layouts beside their best-F1 GT match
        # (reference: sampler_node_adj.py:554-573, one panel per F1 weighting)
        if metrics.get("_mat_f1") and "bbox" in res and "q_node" in res:
            # num_plots = panel FILES per weighting, two scene graphs each
            # (reference passes 8; default 2 keeps checkpoint evals cheap —
            # test.num_retrieval_plots restores the reference count)
            n_panels = int(config.test.get("num_retrieval_plots", 2))
            for name, mat in metrics["_mat_f1"].items():
                plot_scene_graph_bbox(
                    res["q_node"], res["bbox"], res["q_adj"],
                    res["q_node_gt"], res["bbox_gt"], res["q_adj_gt"],
                    mat, res["flags"], res["flags_gt"], bundle.idx_to_word,
                    save_dir=outdir,
                    title=f"bbox_{name}_f1_{stamp}_{mode_tag}.png",
                    num_plots=n_panels)
    except Exception as e:  # plotting must never kill an eval run
        logging.warning("scene-graph plotting failed: %s", e)


def _write_scene_graph_txt(path, adjs, nodes, flags, idx_to_word):
    classes = idx_to_word.get("ind_to_classes", [])
    preds = idx_to_word.get("ind_to_predicates", [])
    lines = []
    for gi, (a, x) in enumerate(zip(adjs, nodes)):
        n = int(np.asarray(flags[gi]).astype(bool).sum())
        s = f"{'-' * 40} scene graph no. {gi} / {len(adjs)} {'-' * 40}\n"
        s += "".ljust(20)
        for j in range(n):
            s += str(classes[int(x[j])] if int(x[j]) < len(classes) else x[j]).ljust(20)
        s += "\n"
        for i in range(n):
            s += str(classes[int(x[i])] if int(x[i]) < len(classes) else x[i]).ljust(20)
            for j in range(n):
                if a[i][j] > 0:
                    pred = preds[int(a[i][j])] if int(a[i][j]) < len(preds) else a[i][j]
                    s += str(pred).ljust(20)
                else:
                    s += "".ljust(20)
            s += "\n"
        lines.append(s)
    np.savetxt(path, lines, fmt="%s")
