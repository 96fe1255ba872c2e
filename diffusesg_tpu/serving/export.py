"""Ahead-of-time export of the sampling pipeline for deployment.

The reference has no serving story: inference means checking out the repo,
rebuilding the torch model and running ``eval.py`` (reference:
DiffuseSG/eval.py:80-101).  On TPU we can do better: ``jax.export``
serializes the *compiled computation* — the full reverse-diffusion scan,
the denoiser with its Pallas kernels, and the integer decode — into a
portable StableHLO artifact that a serving process can load and run
without any model code, checkpoint restore, or Python-side config.

The exported callable is end-to-end:

    (seed:int32[], node_flags:bool[B,N]) -> (adj_types:int32[B,N,N],
                                             node_types:int32[B,N],
                                             bboxes:float32[B,N,4])

i.e. it takes a seed + per-slot node masks and returns decoded integer
scene graphs with [0,1] cxcywh boxes — the same decode the evaluation
orchestrator uses (sampling/decode.py; reference decode:
sampler_node_adj.py:221-293).

Artifacts are a directory: ``sampler.bin`` (serialized Exported) +
``meta.json`` (dataset/encoding/shape/platform provenance).  Platforms are
checked at load: a TPU-exported artifact only runs on TPU.
"""
from __future__ import annotations

import json
import os
from functools import partial

import jax
import jax.numpy as jnp

from ..models.channels import resolve_sampling_channels
from ..models.precond import precond_forward
from ..sampling.decode import decode_samples
from ..sampling.edm_sampler import NodeAdjEDMSampler

ARTIFACT_BIN = "sampler.bin"
ARTIFACT_META = "meta.json"


def _serving_impl(model, sampler: NodeAdjEDMSampler, config):
    """(params, rng, node_flags) -> decoded-graphs core shared by the
    single-device, GSPMD, and shard_map serving variants."""
    info = resolve_sampling_channels(config)
    if info["flag_node_only"]:
        raise NotImplementedError(
            "serving export supports the joint node+edge+bbox configs; "
            "node_only ablation models are eval-only")
    decode = partial(
        decode_samples,
        node_encoding=config.train.node_encoding,
        edge_encoding=config.train.edge_encoding,
        num_node_type=info["raw_num_node_type"],
        num_adj_type=(info["raw_num_adj_type"]
                      if not info["flag_binary_edge"] else 2),
        flag_bbox=True, flag_node_only=False)

    def impl(params, rng, node_flags):
        def denoiser(a, x, sigmas, sc_a, sc_x):
            def model_fn(aa, xx, flags, c_noise, s_a, s_x):
                return model.apply(params, aa, xx, flags, c_noise, s_a, s_x)
            return precond_forward(model_fn, config.mcmc.get("precond", "edm"),
                                   a, x, node_flags, sigmas, sc_a, sc_x)

        adjs, nodes = sampler.sample(denoiser, rng, node_flags,
                                     info["num_node_chan"],
                                     info["num_adj_chan"])
        dec = decode(adjs, nodes, node_flags)
        return dec.adj_types, dec.node_types, dec.bboxes

    return impl


def make_serving_fn(model, params, sampler: NodeAdjEDMSampler, config):
    """Build the jittable end-to-end (seed, node_flags) -> decoded-graphs fn.

    Unlike the eval orchestrator's sample fn (orchestrator.make_sample_fn)
    this takes a plain int32 seed (PRNG keys don't serialize portably),
    fuses the decode into the same program, and returns only the integer
    tensors a serving caller needs.
    """
    impl = _serving_impl(model, sampler, config)

    def serve_fn(seed, node_flags):
        return impl(params, jax.random.PRNGKey(seed), node_flags)

    return serve_fn


def make_sharded_serving_fn(model, params, sampler: NodeAdjEDMSampler, config,
                            mesh, spmd_mode: str = "gspmd",
                            axis_name: str = "data"):
    """Multi-chip serving: the batch axis sharded over every device of
    ``mesh``, params replicated — the serving face of the eval
    orchestrator's sharded sampling (sampling/orchestrator.make_sample_fn
    with mesh, itself the counterpart of the reference's DDP eval sharding,
    sampler_node_adj.py:331-345).  Returns a jitted
    (seed, node_flags[B,N]) -> (adj, node, bbox) with B % mesh.size == 0.

    ``spmd_mode`` mirrors config.tpu.spmd_mode: "gspmd" (partitioner splits
    the program; bit-identical to single-device) or "shard_map" (explicit
    per-shard execution that carries the Pallas kernels to multi-chip; each
    shard folds its axis index into the seed's key, so the stream differs
    from the single-device program like the reference's per-rank torch RNGs,
    dist_training.py:34-41).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import replicate_tree

    impl = _serving_impl(model, sampler, config)
    if spmd_mode == "shard_map":
        def local_fn(p, seed, node_flags):
            rng = jax.random.fold_in(jax.random.PRNGKey(seed),
                                     jax.lax.axis_index(axis_name))
            return impl(p, rng, node_flags)

        b0 = P(axis_name)
        sm = jax.shard_map(local_fn, mesh=mesh,
                           in_specs=(P(), P(), b0), out_specs=(b0, b0, b0),
                           check_vma=False)
        jitted = jax.jit(sm)
        params = replicate_tree(params, mesh)
        return lambda seed, node_flags: jitted(params, seed, node_flags)

    params = replicate_tree(params, mesh)
    fn = make_serving_fn(model, params, sampler, config)
    repl = NamedSharding(mesh, P())
    b0 = NamedSharding(mesh, P(axis_name))
    return jax.jit(fn, in_shardings=(repl, b0), out_shardings=(b0, b0, b0))


def make_completion_fn(model, params, sampler: NodeAdjEDMSampler, config):
    """Conditional completion over the serving surface.

    Serving counterpart of the sampler's masked inpainting (the
    generalization of the reference's init_adjs/init_nodes conditional
    mode, reference: runner/mcmc_sampler/edm.py:291-329 — BASELINE
    config 4).  Known parts arrive in USER space (integer types, [0,1]
    cxcywh boxes); they are encoded exactly like the dataset pipeline
    (data/dataset.py:117-160) and held RePaint-style through the reverse
    diffusion, so the output carries them verbatim.

    Signature of the returned jittable fn::

        (seed:int32[], node_flags:bool[B,N],
         known_node:int32[B,N],  mask_node:bool[B,N],
         known_bbox:float32[B,N,4], mask_bbox:bool[B,N],
         known_adj:int32[B,N,N], mask_adj:bool[B,N,N])
          -> (adj_types:int32[B,N,N], node_types:int32[B,N],
              bboxes:float32[B,N,4])

    Node-type and bbox knowledge are masked independently (per-channel
    node mask), so "this node is a person, place it anywhere" works.
    """
    return _completion_fn_from_impl(_completion_impl(model, sampler, config),
                                    params)


def _completion_fn_from_impl(impl, params):
    def complete_fn(seed, *args):
        return impl(params, jax.random.PRNGKey(seed), *args)
    return complete_fn


def _completion_impl(model, sampler: NodeAdjEDMSampler, config):
    """(params, rng, node_flags, known/mask tensors) -> decoded-graphs core
    shared by the single-device, GSPMD, and shard_map completion variants."""
    from ..ops.attribute_code import attribute_converter

    info = resolve_sampling_channels(config)
    if info["flag_node_only"]:
        raise NotImplementedError(
            "completion serving supports the joint node+edge+bbox configs")
    node_enc = config.train.node_encoding
    edge_enc = config.train.edge_encoding
    n_node_type = info["raw_num_node_type"]
    n_edge_type = (info["raw_num_adj_type"]
                   if not info["flag_binary_edge"] else 2)
    decode = partial(
        decode_samples, node_encoding=node_enc, edge_encoding=edge_enc,
        num_node_type=n_node_type, num_adj_type=n_edge_type,
        flag_bbox=True, flag_node_only=False)

    def impl(params, rng, node_flags, known_node, mask_node, known_bbox,
             mask_bbox, known_adj, mask_adj):
        x = attribute_converter(known_node.astype(jnp.float32), node_flags,
                                "int", node_enc, n_node_type, flag_nodes=True,
                                flag_in_ddpm_range=False,
                                flag_out_ddpm_range=True)
        if x.ndim == 2:  # ddpm encodes channel-less; bits/one_hot carry C
            x = x[..., None]
        gt_x = jnp.concatenate([x, (known_bbox - 0.5) * 2.0], axis=-1)
        gt_a = attribute_converter(known_adj.astype(jnp.float32), node_flags,
                                   "int", edge_enc, n_edge_type, flag_adjs=True,
                                   flag_in_ddpm_range=False,
                                   flag_out_ddpm_range=True)
        type_chan = gt_x.shape[-1] - 4
        m_x = jnp.concatenate(
            [jnp.repeat(mask_node[..., None], type_chan, axis=-1),
             jnp.repeat(mask_bbox[..., None], 4, axis=-1)], axis=-1)
        inpaint = {"gt_adjs": gt_a, "gt_nodes": gt_x,
                   "mask_adjs": mask_adj, "mask_nodes": m_x}

        def denoiser(a, xx, sigmas, sc_a, sc_x):
            def model_fn(aa, xxx, flags, c_noise, s_a, s_x):
                return model.apply(params, aa, xxx, flags, c_noise, s_a, s_x)
            return precond_forward(model_fn, config.mcmc.get("precond", "edm"),
                                   a, xx, node_flags, sigmas, sc_a, sc_x)

        adjs, nodes = sampler.sample(denoiser, rng, node_flags,
                                     info["num_node_chan"],
                                     info["num_adj_chan"], inpaint=inpaint)
        dec = decode(adjs, nodes, node_flags)
        return dec.adj_types, dec.node_types, dec.bboxes

    return impl


def make_sharded_completion_fn(model, params, sampler: NodeAdjEDMSampler,
                               config, mesh, spmd_mode: str = "gspmd",
                               axis_name: str = "data"):
    """Multi-chip conditional completion: batch axis sharded like
    make_sharded_serving_fn (same signature as make_completion_fn's
    result; every tensor argument is batch-major)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import replicate_tree

    impl = _completion_impl(model, sampler, config)
    n_batch_args = 7  # node_flags + 3x (known, mask) pairs
    if spmd_mode == "shard_map":
        def local_fn(p, seed, *args):
            rng = jax.random.fold_in(jax.random.PRNGKey(seed),
                                     jax.lax.axis_index(axis_name))
            return impl(p, rng, *args)

        b0 = P(axis_name)
        sm = jax.shard_map(local_fn, mesh=mesh,
                           in_specs=(P(), P()) + (b0,) * n_batch_args,
                           out_specs=(b0, b0, b0), check_vma=False)
        jitted = jax.jit(sm)
        params = replicate_tree(params, mesh)
        return lambda seed, *args: jitted(params, seed, *args)

    params = replicate_tree(params, mesh)
    fn = _completion_fn_from_impl(impl, params)
    repl = NamedSharding(mesh, P())
    b0 = NamedSharding(mesh, P(axis_name))
    return jax.jit(fn, in_shardings=(repl,) + (b0,) * n_batch_args,
                   out_shardings=(b0, b0, b0))


def export_sampler(model, params, sampler: NodeAdjEDMSampler, config,
                   batch_size: int, mesh=None, spmd_mode: str = "gspmd"):
    """AOT-export the serving fn at a fixed batch size -> jax.export.Exported.

    With ``mesh`` (size > 1) the exported program is the SPMD batch-sharded
    sampler (make_sharded_serving_fn): the artifact records the device count
    and a serving process with that many local devices runs it sharded —
    scale-out AOT serving for a full v5e-8 host from one artifact.
    """
    n = config.dataset.max_node_num
    if mesh is not None and mesh.size > 1:
        if batch_size % mesh.size:
            raise ValueError(f"batch_size {batch_size} must divide over the "
                             f"{mesh.size}-device mesh")
        serve_fn = make_sharded_serving_fn(model, params, sampler, config,
                                           mesh, spmd_mode)
    else:
        serve_fn = make_serving_fn(model, params, sampler, config)
    specs = (jax.ShapeDtypeStruct((), jnp.int32),
             jax.ShapeDtypeStruct((batch_size, n), jnp.bool_))
    return jax.export.export(jax.jit(serve_fn))(*specs)


def save_artifact(path: str, exported, config, batch_size: int) -> None:
    """Write the serialized program + provenance metadata to ``path``/."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ARTIFACT_BIN), "wb") as f:
        f.write(exported.serialize())
    meta = {
        "format": "diffusesg_tpu.serving/1",
        "platforms": list(exported.platforms),
        "num_devices": int(exported.nr_devices),
        "batch_size": batch_size,
        "max_node_num": int(config.dataset.max_node_num),
        "dataset": config.dataset.name,
        "node_encoding": config.train.node_encoding,
        "edge_encoding": config.train.edge_encoding,
        "num_steps": int(config.mcmc.num_steps),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
    }
    with open(os.path.join(path, ARTIFACT_META), "w") as f:
        json.dump(meta, f, indent=2)


def load_artifact(path: str):
    """Load an exported artifact -> (callable, meta dict).

    The callable has the exported signature (seed, node_flags) and runs
    under jit on the current backend; a platform mismatch (e.g. a
    TPU-built artifact on CPU) or a device-count mismatch (an 8-chip SPMD
    artifact in a 1-chip process) raises with a clear message.
    """
    with open(os.path.join(path, ARTIFACT_META)) as f:
        meta = json.load(f)
    backend = jax.default_backend()
    if backend not in [p.lower() for p in meta.get("platforms", [])]:
        raise RuntimeError(
            f"serving artifact at {path} was exported for platforms "
            f"{meta.get('platforms')} but this process runs on '{backend}'; "
            "re-export on the target platform")
    ndev = int(meta.get("num_devices", 1))
    # local_devices: a serving process drives ITS OWN chips (matches
    # cli/serve._resolve_mesh); jax.devices() would count non-addressable
    # devices in a multi-host runtime and build an unfeedable mesh
    local_devs = jax.local_devices()
    if ndev > len(local_devs):
        raise RuntimeError(
            f"serving artifact at {path} is an SPMD program over {ndev} "
            f"devices but this process has {len(local_devs)} addressable; "
            "re-export with a matching mesh")
    with open(os.path.join(path, ARTIFACT_BIN), "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    if ndev <= 1:
        return jax.jit(exported.call), meta
    # an SPMD artifact must be CALLED in a matching n-device context:
    # rebuild the serving contract's shardings (seed replicated, batch
    # axis sharded over a 1-D mesh) at the call site
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import make_mesh

    mesh = make_mesh(ndev, devices=local_devs)
    repl = NamedSharding(mesh, P())
    b0 = NamedSharding(mesh, P("data"))
    return jax.jit(exported.call, in_shardings=(repl, b0),
                   out_shardings=(b0, b0, b0)), meta


# ---------------------------------------------------------------------------
# AOT-compiled executables (compile-once, load-in-seconds)

COMPILED_PKL = "compiled.pkl"


def save_compiled(path: str, compiled, meta: dict) -> None:
    """Persist an AOT-compiled executable (jax.jit(...).lower(...).compile())
    plus caller metadata to ``path``/compiled.pkl.

    Unlike the StableHLO artifact above (portable, but the target backend
    still compiles it at load), this serializes the backend EXECUTABLE via
    jax.experimental.serialize_executable — loading skips compilation
    entirely (seconds, not minutes, over the tunnel's remote-compile path).
    The flip side: it is pinned to the exact device topology and compiler
    version, so ``meta`` should record enough to detect staleness (bench.py
    keys on config/batch/steps/dtype/backend/jax-version).
    """
    import pickle

    from jax.experimental.serialize_executable import serialize

    payload, in_tree, out_tree = serialize(compiled)
    try:  # executable device footprint (usually 1); load rebinds to as many
        ndev = len(compiled._executable.xla_executable.local_devices())
    except Exception:  # noqa: BLE001 — internal API; worst case assume 1
        ndev = 1
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, COMPILED_PKL), "wb") as f:
        pickle.dump({"meta": meta, "payload": payload, "num_devices": ndev,
                     "in_tree": in_tree, "out_tree": out_tree}, f)


def load_compiled(path: str):
    """(callable, meta) from save_compiled output; raises FileNotFoundError
    when absent — staleness checks against ``meta`` are the caller's."""
    import pickle

    from jax.experimental.serialize_executable import deserialize_and_load

    with open(os.path.join(path, COMPILED_PKL), "rb") as f:
        blob = pickle.load(f)
    # rebind to exactly the executable's device footprint: with more visible
    # devices than the program spans, deserialize_and_load would otherwise
    # bind ALL of them and then reject single-shard args
    ndev = int(blob.get("num_devices", 1))
    devs = jax.local_devices()
    if ndev > len(devs):
        raise RuntimeError(
            f"compiled artifact at {path} spans {ndev} devices but this "
            f"process has {len(devs)} addressable")
    compiled = deserialize_and_load(blob["payload"], blob["in_tree"],
                                    blob["out_tree"],
                                    execution_devices=devs[:ndev])
    return compiled, blob["meta"]
