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


def make_serving_fn(model, params, sampler: NodeAdjEDMSampler, config):
    """Build the jittable end-to-end (seed, node_flags) -> decoded-graphs fn.

    Unlike the eval orchestrator's sample fn (orchestrator.make_sample_fn)
    this takes a plain int32 seed (PRNG keys don't serialize portably),
    fuses the decode into the same program, and returns only the integer
    tensors a serving caller needs.
    """
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

    def serve_fn(seed, node_flags):
        rng = jax.random.PRNGKey(seed)

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

    return serve_fn


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

    def complete_fn(seed, node_flags, known_node, mask_node, known_bbox,
                    mask_bbox, known_adj, mask_adj):
        rng = jax.random.PRNGKey(seed)
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

    return complete_fn


def export_sampler(model, params, sampler: NodeAdjEDMSampler, config,
                   batch_size: int):
    """AOT-export the serving fn at a fixed batch size -> jax.export.Exported."""
    n = config.dataset.max_node_num
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
    TPU-built artifact on CPU) raises with a clear message.
    """
    with open(os.path.join(path, ARTIFACT_META)) as f:
        meta = json.load(f)
    backend = jax.default_backend()
    if backend not in [p.lower() for p in meta.get("platforms", [])]:
        raise RuntimeError(
            f"serving artifact at {path} was exported for platforms "
            f"{meta.get('platforms')} but this process runs on '{backend}'; "
            "re-export on the target platform")
    with open(os.path.join(path, ARTIFACT_BIN), "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    return jax.jit(exported.call), meta
