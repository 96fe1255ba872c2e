"""Training state: optax optimizer + K stacked EMA parameter copies.

Replaces the reference's Adam/ZeroRedundancyOptimizer + ExponentialLR +
ema_pytorch.EMA list (reference: DiffuseSG/utils/learning_utils.py:126-166).
The K EMAs are held as ONE pytree whose leaves carry a leading [K] axis and
are updated with a single vmapped lerp — no per-EMA module copies.

Under pjit, sharding the state pytree with NamedSharding gives ZeRO-1-style
optimizer-state sharding for free (SURVEY.md §2 parallelism checklist).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array                 # scalar int32
    params: Any                     # model params pytree
    opt_state: Any                  # optax state
    ema_params: Any                 # params pytree with leading [K] axis
    ema_betas: jax.Array            # [K] float32 (sorted ascending, like reference)


def make_optimizer(lr_init: float, lr_decay: float, steps_per_epoch: int,
                   weight_decay: float = 0.0, max_grad_norm: float = 10.0):
    """clip-by-global-norm(10) -> Adam with per-epoch exponential LR decay.

    Mirrors the reference: clip_grad_norm_(max_norm=10) before the step
    (trainer_node_adj.py:174), Adam(betas=(0.9, 0.999), eps=1e-8)
    (learning_utils.py:137-140), ExponentialLR stepped per epoch with
    gamma=lr_dacey (learning_utils.py:141).
    """
    def lr_schedule(count):
        epoch = count // max(1, steps_per_epoch)
        return lr_init * (lr_decay ** epoch)

    opt = optax.adam(learning_rate=lr_schedule, b1=0.9, b2=0.999, eps=1e-8)
    if weight_decay > 0.0:
        # torch.optim.Adam COUPLES the L2 term into the gradient before the
        # adaptive moments (grad' = grad + wd*p); decoupled AdamW would train
        # a different objective.  Order matches the reference runtime:
        # clip_grad_norm_ on the raw grads, then step() adds wd inside Adam
        # (trainer_node_adj.py:174, learning_utils.py:137-140).
        opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
    return optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)


def create_train_state(params, ema_betas: Sequence[float], optimizer) -> TrainState:
    betas = jnp.asarray(sorted(ema_betas), jnp.float32)
    k = betas.shape[0]
    ema_params = jax.tree.map(lambda p: jnp.broadcast_to(p[None], (k,) + p.shape).copy(), params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params), ema_params=ema_params,
                      ema_betas=betas)


def ema_effective_decay(betas, step):
    """ema_pytorch's step-dependent decay schedule, for the reference's
    constructor args EMA(beta, update_every=1, update_after_step=0,
    inv_gamma=1, power=1) (reference: DiffuseSG/utils/learning_utils.py:160).

    With ``step`` = number of completed updates before this call (our
    TrainState.step), ema_pytorch's k-th update call (k = step + 1) applies
      k = 1: copy (step <= update_after_step path)
      k = 2: copy (first initted update; the follow-up lerp is a no-op)
      k >= 3: decay = min(beta, 1 - (1 + (k - 1))**-1) = min(beta, 1 - 1/k)
    so the effective decay ramps up over the first ~1/(1-beta) steps.
    """
    k = step.astype(jnp.float32) + 1.0
    eff = jnp.minimum(betas, 1.0 - 1.0 / k)
    return jnp.where(k <= 2.0, jnp.zeros_like(eff), eff)


def update_emas(ema_params, params, betas, step=None):
    """One vmapped lerp across all K EMA copies (learning_utils.py:145-166).

    ``step`` enables ema_pytorch's warmup ramp (see ema_effective_decay);
    pass None for a fixed-beta lerp.
    """
    eff = betas if step is None else ema_effective_decay(betas, step)

    def _lerp(ema_leaf, p_leaf):
        b = eff.reshape((eff.shape[0],) + (1,) * p_leaf.ndim).astype(ema_leaf.dtype)
        return ema_leaf * b + p_leaf[None] * (1.0 - b)
    return jax.tree.map(_lerp, ema_params, params)


def ema_slice(ema_params, idx: int):
    """Extract EMA copy #idx as a regular params pytree."""
    return jax.tree.map(lambda e: e[idx], ema_params)
