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
