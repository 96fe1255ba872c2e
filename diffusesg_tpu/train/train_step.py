"""The jitted training / evaluation step.

One compiled function covers the whole reference inner loop
(reference: DiffuseSG/runner/trainer/trainer_node_adj.py:95-178): sigma
sampling, noising, preconditioned forward with stochastic self-conditioning,
rainbow + IoU losses, gradient clipping, Adam update and all K EMA updates.
Under pjit with a batch-sharded input this is data-parallel training — the
gradient all-reduce is inserted by XLA (no NCCL/DDP analogue needed).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..diffusion.edm import NodeAdjEDMObjective
from ..models.precond import precond_forward_train
from .loss import NodeAdjRainbowLoss, bbox_iou_aux_loss
from .train_state import TrainState, update_emas


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    precond: str = "edm"
    sigma_dist: str = "edm"
    self_condition: bool = True
    symmetric_noise: bool = False
    edge_loss_weight: float = 1.0
    node_loss_weight: float = 1.0
    iou_loss_type: str = "iou"
    iou_loss_weight: float = 1.0
    flag_node_only: bool = False
    # deferred one-hot encoding (reference: trainer_node_adj.py:72-93 —
    # one_hot datasets store ints and encode per mini-batch to save memory)
    node_encoding: str = "ddpm"
    edge_encoding: str = "ddpm"
    num_node_type: int = 0  # one-hot class counts (bbox excluded)
    num_edge_type: int = 0


def encode_one_hot_batch(adjs_gt, nodes_gt, node_flags, cfg: TrainStepConfig):
    """Per-batch deferred one-hot encoding (trainer_node_adj.py:72-93):
    one_hot datasets carry int labels ([B,N,N] adjs; nodes as [B,N,1+4] with
    the int type in channel 0 and bbox in the rest)."""
    from ..ops.attribute_code import attribute_int_to_one_hot

    if cfg.node_encoding == "one_hot" and not cfg.flag_node_only:
        node_type = nodes_gt[..., 0]
        bbox = nodes_gt[..., 1:]
        oh = attribute_int_to_one_hot(node_type, node_flags, cfg.num_node_type,
                                      flag_ddpm_range=True, flag_nodes=True)
        nodes_gt = jnp.concatenate([oh, bbox], axis=-1)
    if cfg.edge_encoding == "one_hot":
        adjs_gt = attribute_int_to_one_hot(adjs_gt, node_flags, cfg.num_edge_type,
                                           flag_ddpm_range=True, flag_adjs=True)
    return adjs_gt, nodes_gt


def make_loss_fn(model_apply: Callable, cfg: TrainStepConfig):
    """Build loss(params, rng, batch) -> (scalar, aux dict)."""
    objective = NodeAdjEDMObjective(precond=cfg.precond, sigma_dist=cfg.sigma_dist,
                                    symmetric_noise=cfg.symmetric_noise)
    rainbow = NodeAdjRainbowLoss(cfg.edge_loss_weight, cfg.node_loss_weight)

    def loss_fn(params, rng, adjs_gt, nodes_gt, node_flags):
        adjs_gt, nodes_gt = encode_one_hot_batch(adjs_gt, nodes_gt, node_flags, cfg)
        rng_obj, rng_sc = jax.random.split(rng)
        ob = objective.get_input_output(rng_obj, adjs_gt, nodes_gt, node_flags)

        def denoiser_fn(a, x, flags_, c_noise, sc_a, sc_x):
            return model_apply(params, a, x, flags_, c_noise, sc_a, sc_x)

        D_a, D_x = precond_forward_train(
            denoiser_fn, cfg.precond, cfg.self_condition, rng_sc,
            ob.net_input_a, ob.net_input_x, node_flags, ob.sigmas,
            symmetric_noise=cfg.symmetric_noise)

        loss_adj, loss_node = rainbow(D_a, D_x, ob.net_target_a, ob.net_target_x,
                                      node_flags, loss_weight=ob.weights)
        if cfg.iou_loss_weight > 0.0 and not cfg.flag_node_only:
            iou = bbox_iou_aux_loss(D_x, ob.net_target_x, node_flags, ob.weights,
                                    cfg.iou_loss_type)
            loss_node = loss_node + cfg.iou_loss_weight * iou
        if cfg.flag_node_only:
            loss_node = loss_node * 0.0
        loss = loss_adj.mean() + loss_node.mean()
        aux = {"loss_adj": loss_adj, "loss_node": loss_node, "sigmas": ob.sigmas}
        return loss, aux

    return loss_fn


def train_step_config_from(config) -> TrainStepConfig:
    """Config -> TrainStepConfig (mirrors reference trainer wiring)."""
    from ..models.channels import get_node_adj_num_type
    info = get_node_adj_num_type(config.dataset.name, config.flag_sg, "one_hot",
                                 config.train.get("node_only", False),
                                 flag_node_bbox=False)
    return TrainStepConfig(
        precond=config.mcmc.precond,
        sigma_dist=config.mcmc.sigma_dist,
        self_condition=config.train.self_cond,
        symmetric_noise=not config.flag_sg,
        edge_loss_weight=config.train.edge_loss_weight,
        node_loss_weight=config.train.node_loss_weight,
        iou_loss_type=config.train.iou_loss_type,
        iou_loss_weight=config.train.iou_loss_weight,
        flag_node_only=config.train.get("node_only", False),
        node_encoding=config.train.node_encoding,
        edge_encoding=config.train.edge_encoding,
        num_node_type=info["num_node_type"],
        num_edge_type=info["num_adj_type"])


def make_train_step(model_apply: Callable, optimizer, cfg: TrainStepConfig,
                    axis_name: str | None = None):
    """(state, rng, batch) -> (state, metrics); jit/pjit this.

    ``axis_name``: set when the step runs INSIDE shard_map/pmap over that
    mesh axis — gradients and scalar metrics are lax.pmean'd across shards
    (the explicit-collective analogue of what GSPMD inserts automatically
    under pjit; used by parallel/shardmap_dp.py to carry the Pallas kernels
    to multi-chip).
    """
    loss_fn = make_loss_fn(model_apply, cfg)

    def train_step(state: TrainState, rng, adjs_gt, nodes_gt, node_flags):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, rng, adjs_gt, nodes_gt, node_flags)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        ema_params = update_emas(state.ema_params, params, state.ema_betas,
                                 step=state.step)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, ema_params=ema_params,
                               ema_betas=state.ema_betas)
        loss_adj_m = aux["loss_adj"].mean()
        loss_node_m = aux["loss_node"].mean()
        if axis_name is not None:
            loss_adj_m = jax.lax.pmean(loss_adj_m, axis_name)
            loss_node_m = jax.lax.pmean(loss_node_m, axis_name)
        metrics = {"loss": loss,
                   "loss_adj": loss_adj_m,
                   "loss_node": loss_node_m,
                   "loss_adj_per_sample": aux["loss_adj"],
                   "loss_node_per_sample": aux["loss_node"],
                   "sigmas": aux["sigmas"]}
        return new_state, metrics

    return train_step


def make_eval_step(model_apply: Callable, cfg: TrainStepConfig,
                   axis_name: str | None = None):
    """Test-pass step computing the same losses without updates
    (reference: trainer_node_adj.py:112-114 'test' mode)."""
    loss_fn = make_loss_fn(model_apply, cfg)

    def eval_step(params, rng, adjs_gt, nodes_gt, node_flags):
        loss, aux = loss_fn(params, rng, adjs_gt, nodes_gt, node_flags)
        loss_adj_m = aux["loss_adj"].mean()
        loss_node_m = aux["loss_node"].mean()
        if axis_name is not None:
            loss = jax.lax.pmean(loss, axis_name)
            loss_adj_m = jax.lax.pmean(loss_adj_m, axis_name)
            loss_node_m = jax.lax.pmean(loss_node_m, axis_name)
        return {"loss": loss,
                "loss_adj": loss_adj_m,
                "loss_node": loss_node_m,
                "loss_adj_per_sample": aux["loss_adj"],
                "loss_node_per_sample": aux["loss_node"],
                "sigmas": aux["sigmas"]}

    return eval_step
