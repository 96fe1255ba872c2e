"""EDM preconditioning wrapper around the raw denoiser.

Functional counterpart of the reference NodeAdjPrecond module
(reference: DiffuseSG/model/precond/precond.py:60-114):

    D_adj  = c_skip * adjs  + c_out * F_adj(c_in * adjs, c_in * nodes, ...)
    D_node = c_skip * nodes + c_out * F_node(...)

with training-time stochastic self-conditioning: with probability 0.5 a
stop-gradient forward pass produces (D_adj, D_node) that are fed back as
self-conditioning inputs (precond.py:90-98).  Under jit this is a
``lax.cond`` on a Bernoulli draw — both branches are compiled once; only one
executes per step.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..diffusion.edm import get_preconditioning_params
from ..ops.masking import mask_adjs, mask_nodes

# DenoiserFn: (adj, node, node_flags, c_noise, self_cond_a, self_cond_x) -> (F_adj, F_node)
DenoiserFn = Callable[..., tuple[jax.Array, jax.Array]]


def _bshape(x: jax.Array, like: jax.Array) -> jax.Array:
    """Broadcast a [B] coefficient over the trailing dims of ``like``."""
    return x.reshape((x.shape[0],) + (1,) * (like.ndim - 1)).astype(like.dtype)


def precond_forward(denoiser_fn: DenoiserFn, precond: str,
                    adjs: jax.Array, nodes: jax.Array, node_flags: jax.Array,
                    sigmas: jax.Array, self_cond_adjs=None, self_cond_nodes=None,
                    symmetric_noise: bool = False):
    """One preconditioned denoiser evaluation (inference path).

    Reference: precond.py:100-110 minus the stochastic self-cond branch.
    """
    c_skip, c_out, c_in, c_noise = get_preconditioning_params(precond, sigmas)
    F_a, F_x = denoiser_fn(_bshape(c_in, adjs) * adjs, _bshape(c_in, nodes) * nodes,
                           node_flags, c_noise, self_cond_adjs, self_cond_nodes)
    D_a = _bshape(c_skip, adjs) * adjs + _bshape(c_out, adjs) * F_a.astype(jnp.float32)
    D_x = _bshape(c_skip, nodes) * nodes + _bshape(c_out, nodes) * F_x.astype(jnp.float32)
    D_a = mask_adjs(D_a, node_flags)
    D_x = mask_nodes(D_x, node_flags)
    return D_a, D_x


def precond_forward_train(denoiser_fn: DenoiserFn, precond: str, self_condition: bool,
                          rng: jax.Array,
                          adjs: jax.Array, nodes: jax.Array, node_flags: jax.Array,
                          sigmas: jax.Array, symmetric_noise: bool = False):
    """Training forward with p=0.5 stochastic self-conditioning.

    Reference: precond.py:90-105.  The first (conditioning) pass runs under
    stop_gradient; whether it runs at all is a per-batch Bernoulli draw, as a
    ``lax.cond``.
    """
    if not self_condition:
        return precond_forward(denoiser_fn, precond, adjs, nodes, node_flags, sigmas,
                               None, None, symmetric_noise)

    def _with_self_cond(_):
        sc_a, sc_x = precond_forward(denoiser_fn, precond, adjs, nodes, node_flags,
                                     sigmas, None, None, symmetric_noise)
        sc_a = jax.lax.stop_gradient(sc_a)
        sc_x = jax.lax.stop_gradient(sc_x)
        return precond_forward(denoiser_fn, precond, adjs, nodes, node_flags, sigmas,
                               sc_a, sc_x, symmetric_noise)

    def _without_self_cond(_):
        zero_a = jnp.zeros_like(adjs)
        zero_x = jnp.zeros_like(nodes)
        # pass explicit zeros (what the model substitutes for None) so both
        # cond branches have identical signatures
        return precond_forward(denoiser_fn, precond, adjs, nodes, node_flags, sigmas,
                               zero_a, zero_x, symmetric_noise)

    use_sc = jax.random.bernoulli(rng, 0.5)
    return jax.lax.cond(use_sc, _with_self_cond, _without_self_cond, operand=None)


def round_sigma(sigma):
    """Identity on arrays (reference: precond.py:112-114)."""
    return jnp.asarray(sigma)


# ---------------------------------------------------------------------------
# adj-only preconditioning (reference Precond, precond.py:9-57) — the
# pure-graph path (no node modality); dead under every shipped config but a
# reference component, kept for API completeness.

# AdjDenoiserFn: (adj, node_flags, c_noise, self_cond) -> F_adj
AdjDenoiserFn = Callable[..., jax.Array]


def precond_forward_adj(denoiser_fn: AdjDenoiserFn, precond: str,
                        adjs: jax.Array, node_flags: jax.Array,
                        sigmas: jax.Array, self_cond=None):
    """One adj-only preconditioned evaluation (reference: precond.py:22-53,
    minus the stochastic self-cond branch).  The reference asserts output
    symmetry (check_adjs_symmetry, precond.py:52); here masking alone is
    applied — symmetry is the denoiser's contract, checked in tests."""
    c_skip, c_out, c_in, c_noise = get_preconditioning_params(precond, sigmas)
    F_a = denoiser_fn(_bshape(c_in, adjs) * adjs, node_flags, c_noise, self_cond)
    D_a = _bshape(c_skip, adjs) * adjs + _bshape(c_out, adjs) * F_a.astype(jnp.float32)
    return mask_adjs(D_a, node_flags)


def precond_forward_train_adj(denoiser_fn: AdjDenoiserFn, precond: str,
                              self_condition: bool, rng: jax.Array,
                              adjs: jax.Array, node_flags: jax.Array,
                              sigmas: jax.Array):
    """Adj-only training forward with p=0.5 stochastic self-conditioning
    (reference: precond.py:39-47).  NOTE the reference quirk at
    precond.py:39: ``self_cond = None`` unconditionally discards any
    caller-passed conditioning, so the signature takes none."""
    if not self_condition:
        return precond_forward_adj(denoiser_fn, precond, adjs, node_flags,
                                   sigmas, None)

    def _with_self_cond(_):
        sc = precond_forward_adj(denoiser_fn, precond, adjs, node_flags,
                                 sigmas, None)
        sc = jax.lax.stop_gradient(sc)
        return precond_forward_adj(denoiser_fn, precond, adjs, node_flags,
                                   sigmas, sc)

    def _without_self_cond(_):
        return precond_forward_adj(denoiser_fn, precond, adjs, node_flags,
                                   sigmas, jnp.zeros_like(adjs))

    use_sc = jax.random.bernoulli(rng, 0.5)
    return jax.lax.cond(use_sc, _with_self_cond, _without_self_cond,
                        operand=None)
