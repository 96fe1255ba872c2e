"""Sampler factory (reference: DiffuseSG/utils/sampling_utils.py:8-31)."""
from __future__ import annotations

from .edm_sampler import NodeAdjEDMSampler


def get_mc_sampler(config) -> NodeAdjEDMSampler:
    if config.mcmc.name != "edm":
        raise NotImplementedError("only the EDM sampler family is supported")
    return NodeAdjEDMSampler(
        solver="heun",
        discretization="edm",
        schedule="linear",
        scaling="none",
        num_steps=config.mcmc.num_steps,
        self_condition=config.train.self_cond,
        symmetric_noise=not config.flag_sg,
    )
