"""shard_map data parallelism: the multi-chip path for the Pallas kernels.

Under pjit/GSPMD a Pallas kernel lowers to ``tpu_custom_call``, which the
SPMD partitioner treats as opaque: with a batch-sharded operand XLA
all-gathers the full batch onto every chip and runs the whole kernel
replicated — correct, but zero speedup.  ``shard_map`` instead runs the
per-shard computation (Pallas kernels included, on their local batch
slice) on each device, with the one cross-shard collective written
explicitly: the gradient/metric ``lax.pmean`` (train/train_step.py takes
``axis_name`` for exactly this).

This is the TPU-native multi-chip fast path for both training and eval
sampling when ``tpu.use_pallas_attention`` is on; the GSPMD path
(parallel/sharded_step.py, sampling/orchestrator.make_sample_fn) remains
the default for the XLA-attention path, where the partitioner handles
everything including tensor parallelism (parallel/tp.py).

RNG semantics: each shard folds ``jax.lax.axis_index(axis)`` into the
step key, so shards draw independent noise/sigmas — the same
distribution as a global draw, but a different stream than the
single-device program (the reference's DDP workers likewise each own a
torch RNG stream, dist_training.py:34-41).  Equivalence tests emulate
the per-shard fold on the host and match results exactly
(tests/test_shardmap_dp.py).

State layout: params/optimizer/EMAs fully replicated (P()); ZeRO-1
sharding is a GSPMD-path feature.  At 35.8M params the replicated state
is ~0.6 GB fp32 — trivial against a v5e's 16 GB HBM.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.train_step import TrainStepConfig, make_eval_step, make_train_step


def _metrics_specs(axis_name: str):
    """out_specs matching the metrics dict of train_step.py's make_train_step
    / make_eval_step (one definition for both shard_map wrappers)."""
    return {"loss": P(), "loss_adj": P(), "loss_node": P(),
            "loss_adj_per_sample": P(axis_name),
            "loss_node_per_sample": P(axis_name),
            "sigmas": P(axis_name)}


def make_shardmap_train_step(model_apply: Callable, optimizer,
                             cfg: TrainStepConfig, mesh: Mesh,
                             axis_name: str = "data",
                             donate: bool = True) -> Callable:
    """(state, rng, adjs, nodes, flags) -> (state, metrics), shard_mapped
    over ``axis_name``: batch sharded, state replicated, grads pmean'd."""
    step = make_train_step(model_apply, optimizer, cfg, axis_name=axis_name)

    def local_step(state, rng, adjs, nodes, flags):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        return step(state, rng, adjs, nodes, flags)

    sm = jax.shard_map(local_step, mesh=mesh,
                       in_specs=(P(), P(), P(axis_name), P(axis_name),
                                 P(axis_name)),
                       out_specs=(P(), _metrics_specs(axis_name)),
                       check_vma=False)
    return jax.jit(sm, donate_argnums=(0,) if donate else ())


def make_shardmap_eval_step(model_apply: Callable, cfg: TrainStepConfig,
                            mesh: Mesh, axis_name: str = "data") -> Callable:
    """(params, rng, adjs, nodes, flags) -> metrics, shard_mapped."""
    step = make_eval_step(model_apply, cfg, axis_name=axis_name)

    def local_step(params, rng, adjs, nodes, flags):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        return step(params, rng, adjs, nodes, flags)

    sm = jax.shard_map(local_step, mesh=mesh,
                       in_specs=(P(), P(), P(axis_name), P(axis_name),
                                 P(axis_name)),
                       out_specs=_metrics_specs(axis_name), check_vma=False)
    return jax.jit(sm)


def make_shardmap_sample_fn(model, params, sampler, num_node_chan: int,
                            num_edge_chan: int, mesh: Mesh,
                            precond: str = "edm", num_interim: int = 0,
                            axis_name: str = "data") -> Callable:
    """(rng, node_flags) -> (adjs, nodes[, interim_a, interim_x]): the
    reverse-diffusion scan + Pallas denoiser run per-shard on each chip's
    batch slice (no collectives — sampling is embarrassingly batch-parallel).
    Mirrors sampling/orchestrator.make_sample_fn's GSPMD variant."""
    from ..models.precond import precond_forward
    from .mesh import replicate_tree

    params = replicate_tree(params, mesh)
    key = (model, sampler, num_node_chan, num_edge_chan, mesh, precond,
           num_interim, axis_name)
    try:
        jitted = _SHARDMAP_SAMPLE_CACHE.get(key)
    except TypeError:
        jitted, key = None, None
    if jitted is not None:
        return lambda rng, node_flags: jitted(params, rng, node_flags)

    def local_fn(p, rng, node_flags):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        def denoiser(a, x, sigmas, sc_a, sc_x):
            def model_fn(aa, xx, flags, c_noise, s_a, s_x):
                return model.apply(p, aa, xx, flags, c_noise, s_a, s_x)
            return precond_forward(model_fn, precond, a, x, node_flags,
                                   sigmas, sc_a, sc_x)

        return sampler.sample(denoiser, rng, node_flags,
                              num_node_chan, num_edge_chan,
                              num_interim=num_interim)

    b0, b1 = P(axis_name), P(None, axis_name)
    out_specs = (b0, b0) if num_interim <= 0 else (b0, b0, b1, b1)
    sm = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(P(), P(), b0), out_specs=out_specs,
                       check_vma=False)
    jitted = jax.jit(sm)
    if key is not None:
        _SHARDMAP_SAMPLE_CACHE[key] = jitted
    return lambda rng, node_flags: jitted(params, rng, node_flags)


# one jitted program per (model, sampler, geometry, mesh) configuration:
# successive checkpoint evals (fresh EMA weights, same shapes) reuse it
# instead of re-tracing (see orchestrator._build_sample_fn for the history)
_SHARDMAP_SAMPLE_CACHE: dict = {}
